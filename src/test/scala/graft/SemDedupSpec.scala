package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup semantic-dedup contracts (exact values are oracle-checked by
  * q_semdedup; these pin the semantics and the skew guard). Lives in
  * graft.llm to reach the package-private pair kernel. */
class SemDedupSpec extends AnyFunSuite {
  import graft.SparkTestSession._

  private val sf01 = "/root/testdata/sf0.01"

  // the kernel's exact arithmetic: float->double casts, sequential
  // index-order multiply-add — bit-identical to FloatVecCosine
  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("survivors are minimal per cluster: every drop has a smaller-id witness, no surviving near pair") {
    val emb = spark.read.parquet(s"$sf01/embeddings.parquet")
    val kept = Similarity.semDedup(emb).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cluster")).toMap
    val asg = Similarity.ivfTrain(emb).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cluster")).toMap
    // cluster column IS the trained IVF assignment
    assert(kept.forall { case (id, c) => asg(id) == c })
    val vecs = emb.collect().map(r =>
      r.getAs[Long]("vec_id") -> r.getSeq[Float](1).toArray).toMap
    val tau = 0.3
    val dropped = asg.keySet -- kept.keySet
    assert(dropped.nonEmpty, "fixture produced no dups — test is vacuous")
    // every dropped vector has a smaller-id same-cluster near neighbor
    dropped.foreach { id =>
      val witness = asg.exists { case (o, c) =>
        o < id && c == asg(id) && cos(vecs(o), vecs(id)) >= tau }
      assert(witness, s"$id dropped without a smaller-id near neighbor")
    }
    // and no two SURVIVORS in one cluster are still near-duplicates
    val byCluster = kept.keys.toSeq.groupBy(kept(_))
    byCluster.values.foreach { ids =>
      val s = ids.sorted
      for (i <- s.indices; j <- i + 1 until s.length)
        assert(cos(vecs(s(i)), vecs(s(j))) < tau,
          s"surviving near pair (${s(i)}, ${s(j)})")
    }
  }

  test("hot-cluster star guard bounds a degenerate cluster to linear pairs") {
    val s = spark; import s.implicits._
    val n = 1000
    val vec = (0 until 64).map(_.toFloat / 64f)
    val e = (0 until n).map(i => (i.toLong, vec, 0))
      .toDF("vec_id", "embedding", "cid")
    val pairs = Similarity.groupedCosinePairs(e, "cid", cap = 64).collect()
    assert(pairs.length == n - 1, s"expected ${n - 1} hub pairs, got ${pairs.length}")
    assert(pairs.forall(_.getAs[Long]("id_a") == 0L))
    // dedup stays correct THROUGH the guard: only the hub survives
    val emb = (0 until n).map(i => (i.toLong, vec, "c0"))
      .toDF("vec_id", "embedding", "label")
    val kept = Similarity.semDedup(emb, hotClusterCap = 64).collect()
    assert(kept.map(_.getAs[Long]("vec_id")).toSeq == Seq(0L))
  }

  test("normal corpora are untouched by the guard: default cap equals unguarded") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = Similarity.semDedup(emb).collect().map(_.toString).toSeq
    val unguarded = Similarity.semDedup(emb, hotClusterCap = Int.MaxValue)
      .collect().map(_.toString).toSeq
    assert(base == unguarded)
  }
}

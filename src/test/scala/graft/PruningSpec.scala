package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Wave 15 — data-pruning & storage-efficiency family: soft dedup,
  * prototypicality pruning, cluster purity, CCNet buckets, int8 audit. */
class PruningSpec extends AnyFunSuite {
  import SparkTestSession._

  test("softDedup: per-source effective mass sums to the distinct-text count") {
    val out = llm.Dedup.softDedup(spark, sfDir).collect()
    val docs = Tables.t(spark, sfDir, "documents")
    val distinctTexts = docs.select("text").distinct().count()
    val effTotal = out.map(_.getAs[Double]("eff_docs")).sum
    assert(math.abs(effTotal - distinctTexts) < 1e-3,
      s"sum(eff_docs)=$effTotal != distinct texts $distinctTexts")
    out.foreach { r =>
      assert(r.getAs[Double]("eff_docs") <= r.getAs[Long]("n_docs") + 1e-9)
      assert(r.getAs[Double]("eff_chars") <= r.getAs[Long]("n_chars") + 1e-6)
    }
  }

  test("protoPrune: each cell prunes exactly floor(25%) and prunes its closest vectors") {
    val rows = llm.Similarity.protoPrune(spark, sfDir).collect()
    rows.groupBy(_.getAs[Int]("cid")).foreach { case (cid, cell) =>
      val n = cell.length
      val pruned = cell.filter(_.getAs[Int]("prune") == 1)
      assert(pruned.length == math.floor(n * 0.25).toInt,
        s"cell $cid: ${pruned.length} pruned of $n")
      if (pruned.nonEmpty && pruned.length < n) {
        val maxPruned = pruned.map(_.getAs[Double]("d")).max
        val minKept = cell.filter(_.getAs[Int]("prune") == 0)
          .map(_.getAs[Double]("d")).min
        assert(maxPruned <= minKept,
          s"cell $cid: pruned d $maxPruned > kept d $minKept")
      }
      // ranks are a permutation of 1..n within the cell
      assert(cell.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to n))
    }
  }

  test("clusterPurity: sizes sum to the corpus, purity is a valid majority share") {
    val rows = llm.Similarity.clusterPurity(spark, sfDir).collect()
    val total = Tables.t(spark, sfDir, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == total)
    rows.foreach { r =>
      val p = r.getAs[Double]("purity")
      assert(p > 0.0 && p <= 1.0)
      // a majority share over L labels is at least 1/L of the cell
      assert(p * r.getAs[Long]("n_vecs") >= 1.0 - 1e-9)
    }
  }

  test("ccnetBuckets: tertiles cover every doc, sizes within 1, monotone mean xent") {
    val rows = llm.TextOps.ccnetBuckets(spark, sfDir).collect()
    val total = Tables.t(spark, sfDir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, bs) =>
      val byName = bs.map(r => r.getAs[String]("bucket") -> r).toMap
      assert(byName.keySet == Set("head", "middle", "tail") ||
        bs.map(_.getAs[Long]("n_docs")).sum < 3, s"$lang buckets: ${byName.keySet}")
      if (byName.size == 3) {
        val sizes = bs.map(_.getAs[Long]("n_docs"))
        assert(sizes.max - sizes.min <= 1, s"$lang ntile sizes $sizes")
        val h = byName("head"); val m = byName("middle"); val t = byName("tail")
        assert(h.getAs[Double]("avg_xent") <= m.getAs[Double]("avg_xent") + 1e-9)
        assert(m.getAs[Double]("avg_xent") <= t.getAs[Double]("avg_xent") + 1e-9)
        // bucket ranges do not overlap: head's max <= middle's min, etc.
        assert(h.getAs[Double]("max_xent") <= m.getAs[Double]("min_xent") + 1e-9)
        assert(m.getAs[Double]("max_xent") <= t.getAs[Double]("min_xent") + 1e-9)
      }
    }
  }

  test("protoPruneApprox selects within sketch tolerance of the exact rank, order-consistently") {
    val exact = llm.Similarity.protoPrune(spark, sfDir).collect()
      .groupBy(_.getAs[Int]("cid"))
    val approx = llm.Similarity.protoPruneApprox(spark, sfDir).collect()
      .groupBy(_.getAs[Int]("cid"))
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (cid, ecell) =>
      val acell = approx(cid)
      val en = ecell.count(_.getAs[Int]("prune") == 1)
      val an = acell.count(_.getAs[Int]("prune") == 1)
      // accuracy=10000 on sub-10k cells: the GK sketch is near-exact;
      // allow only tie-width slack around the threshold
      assert(math.abs(an - en) <= math.max(2, ecell.length / 100),
        s"cell $cid: approx pruned $an vs exact $en of ${ecell.length}")
      // set-level agreement (not just counts): the approx SELECTION may
      // differ from the exact rank only in boundary rows
      val exactSet = ecell.filter(_.getAs[Int]("prune") == 1)
        .map(_.getAs[Long]("vec_id")).toSet
      val approxSet = acell.filter(_.getAs[Int]("prune") == 1)
        .map(_.getAs[Long]("vec_id")).toSet
      val disagree = (exactSet diff approxSet) ++ (approxSet diff exactSet)
      assert(disagree.size <= math.max(2, ecell.length / 100),
        s"cell $cid: ${disagree.size} selection disagreements")
    }
  }

  test("clusterSample caps every cell and keeps a deterministic draw") {
    val rows = llm.Similarity.clusterSample(spark, sfDir).collect()
    val byCell = rows.groupBy(_.getAs[Int]("cid"))
    byCell.foreach { case (cid, cell) =>
      assert(cell.length <= 64, s"cell $cid over cap: ${cell.length}")
      assert(cell.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to cell.length))
    }
    // exact expected size: sum over cells of min(cellSize, cap), with
    // cell sizes from the same served quantizer assignment
    val cellSizes = llm.Similarity.protoPrune(spark, sfDir).collect()
      .groupBy(_.getAs[Int]("cid")).map { case (c, v) => c -> v.length }
    assert(byCell.keySet == cellSizes.keySet.filter(cellSizes(_) > 0))
    val expected = cellSizes.values.map(n => math.min(n, 64)).sum
    assert(rows.length == expected,
      s"sampled ${rows.length}, expected $expected from cells $cellSizes")
    val again = llm.Similarity.clusterSample(spark, sfDir).collect()
      .map(_.getAs[Long]("vec_id")).sorted.toSeq
    assert(again == rows.map(_.getAs[Long]("vec_id")).sorted.toSeq)
  }

  test("shared raw quantizer serves the inline q_ivf_train assignment exactly") {
    val served = llm.Similarity.protoPrune(spark, sfDir)
      .select(col("vec_id"), col("cid").as("cluster"))
    val inline = llm.Similarity.ivfTrainQuery(spark, sfDir)
    assert(served.count() == inline.count())
    assert(served.except(inline).count() == 0,
      "shared-quantizer assignment diverged from the inline training")
  }

  test("mixLedger: shares sum to 1, temperature flattens toward uniform") {
    val rows = llm.Sampling.mixLedger(spark, sfDir).collect()
    assert(math.abs(rows.map(_.getAs[Double]("p_raw")).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_.getAs[Double]("p_mix")).sum - 1.0) < 1e-4)
    // flattening: the heaviest source loses share, the lightest gains
    val byMass = rows.sortBy(_.getAs[Double]("eff_chars"))
    val heavy = byMass.last; val light = byMass.head
    assert(heavy.getAs[Double]("p_mix") <= heavy.getAs[Double]("p_raw") + 1e-9)
    assert(light.getAs[Double]("p_mix") >= light.getAs[Double]("p_raw") - 1e-9)
    // mass ordering is preserved (flattened, not reshuffled)
    val mixOrder = byMass.map(_.getAs[Double]("p_mix"))
    assert(mixOrder.zip(mixOrder.tail).forall { case (a, b) => a <= b + 1e-9 })
  }

  test("corpusRelease: gate keeps ~2/3 of dedup survivors, shards token-balanced") {
    val docs = Tables.t(spark, sfDir, "documents")
    val survivors = docs.select("text").distinct().count()
    val rows = llm.TextOps.corpusRelease(spark, sfDir).collect()
    val released = rows.map(_.getAs[Long]("n_docs")).sum
    // ntile(3) keep-1-and-2 keeps between floor(2n/3) and ceil(2n/3)
    // per language; summed over langs the bound is ±|langs|
    val nLangs = docs.select("lang").distinct().count()
    assert(math.abs(released - survivors * 2.0 / 3.0) <= nLangs + 1,
      s"released $released of $survivors survivors")
    val counts = rows.map(_.getAs[Long]("n_docs"))
    assert(counts.max - counts.min <= 1)
    val tots = rows.map(_.getAs[Long]("tot_tokens"))
    // round-robin over the descending token order: spread <= one max doc
    val maxDoc = docs.select(
      max(size(split(trim(col("text")), "\\s+")))).head().getInt(0).toLong
    assert(tots.max - tots.min <= maxDoc,
      s"token spread ${tots.max - tots.min} > max doc $maxDoc")
  }

  test("shardPlan: doc counts within 1, token totals within one max-document") {
    val rows = llm.Sampling.shardPlan(spark, sfDir).collect()
    assert(rows.length == 8)
    val total = Tables.t(spark, sfDir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    val counts = rows.map(_.getAs[Long]("n_docs"))
    assert(counts.max - counts.min <= 1, s"doc skew: ${counts.toSeq}")
    val tots = rows.map(_.getAs[Long]("tot_tokens"))
    val maxDoc = rows.map(_.getAs[Int]("max_tok")).max.toLong
    assert(tots.max - tots.min <= maxDoc,
      s"token skew ${tots.max - tots.min} > max doc $maxDoc")
  }

  test("bpeFertility: per-lang rows aggregate exactly to the corpus coverage card") {
    val fert = llm.TextOps.bpeFertility(spark, sfDir).collect()
    val card = llm.TextOps.bpeCoverageQuery(spark, sfDir).collect()
      .map(r => r.getAs[String]("metric") -> r.getAs[Double]("value")).toMap
    assert(fert.map(_.getAs[Long]("n_words")).sum == card("n_words").toLong)
    assert(fert.map(_.getAs[Long]("n_tokens")).sum == card("n_tokens").toLong)
    fert.foreach { r =>
      val tpw = r.getAs[Double]("tokens_per_word")
      assert(tpw >= 1.0 - 1e-9, s"${r.getAs[String]("lang")}: fertility $tpw < 1")
      val stf = r.getAs[Double]("single_token_frac")
      assert(stf >= 0.0 && stf <= 1.0)
    }
  }

  test("int8Recall on the corpus: recall in [0,1] and mostly agreeing lists") {
    val rows = llm.Similarity.int8Recall(spark, sfDir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      // int8 reconstruction error is small relative to neighbor gaps on
      // this corpus — the served list should mostly agree with truth
      assert(rec >= 0.5, s"q ${r.getAs[Long]("q_id")}: recall $rec < 0.5")
    }
  }

  test("int8Recall self-check: exact reconstruction serves recall 1.0 on a sub-topK corpus") {
    // integer-valued components with amax = 127 make scale = 1.0, so the
    // int8 round-trip is EXACT — served must equal truth, and with only
    // 8 vectors the denominator must be the 7-row truth list, not topK
    val s = spark
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val rows: Seq[Row] = (0L until 8L).map { j =>
      val arr = (0 until 64).map { i =>
        if (i == 0) 127.0f else (((j * 31 + i * 7) % 255) - 127).toFloat
      }
      Row(j, arr, 0)
    }
    import scala.jdk.CollectionConverters._
    val emb = s.createDataFrame(rows.asJava, schema)
    val out = llm.Similarity.int8RecallOf(emb).collect()
    assert(out.length == 3)
    out.foreach(r => assert(r.getAs[Double]("recall") == 1.0,
      s"exact store must serve perfectly: $r"))
  }

  test("int8AuditOf: per-vector mse within the scale/2 worst-case bound; zero vector audits clean") {
    val s = spark
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val zero = Row(999L, Seq.fill(64)(0.0f), 0)
    val ramp = Row(1000L, (0 until 64).map(i => (i - 32) / 17.0f), 1)
    val synth = s.createDataFrame(
      java.util.Arrays.asList(zero, ramp), schema)
    val real = Tables.t(s, sfDir, "embeddings").limit(200)
    val out = llm.Similarity.int8AuditOf(real.unionByName(synth)).collect()
    out.foreach { r =>
      val amax = r.getAs[Double]("amax")
      val mse = r.getAs[Double]("mse")
      val bound = (amax / 254.0) * (amax / 254.0) // (scale/2)^2
      assert(mse >= 0.0 && mse <= bound + 1e-9,
        s"vec ${r.getAs[Long]("vec_id")}: mse $mse > bound $bound")
    }
    val z = out.find(_.getAs[Long]("vec_id") == 999L).get
    assert(z.getAs[Double]("amax") == 0.0 && z.getAs[Double]("mse") == 0.0)
  }
}

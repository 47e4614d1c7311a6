package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Similarity

/** Differential tests for the native FloatVecDot expression against the
  * interpreted zip_with+aggregate fold it replaced. */
class FloatVecDotSpec extends AnyFunSuite {
  import SparkTestSession._

  test("native dot is bit-identical to the fold over real embeddings") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cmp = e.crossJoin(broadcast(
        e.filter(col("vec_id") === 0).select(col("embedding").as("q"))))
      .select(
        Similarity.dot(col("embedding"), col("q")).as("native"),
        Similarity.dotFold(col("embedding"), col("q")).as("fold"))
      .filter(col("native") =!= col("fold") ||
        col("native").isNull =!= col("fold").isNull)
    assert(cmp.count() == 0)
  }

  test("native dot matches fold edge cases: null element, length mismatch") {
    import spark.implicits._
    val rows = Seq(
      (Array(1.0f, 2.0f), Array(3.0f, 4.0f)),      // plain: 11.0
      (Array(1.0f), Array(3.0f, 4.0f)),             // length mismatch: null
      (Array.empty[Float], Array.empty[Float]))     // empty: 0.0
      .toDF("a", "b")
      // null element case needs a nullable array
      .unionByName(Seq(1).toDF("x").select(
        array(lit(1.0f), lit(null).cast("float")).as("a"),
        array(lit(1.0f), lit(2.0f)).as("b")).drop("x"))
    val got = rows.select(
        Similarity.dot(col("a"), col("b")).as("native"),
        Similarity.dotFold(col("a"), col("b")).as("fold"))
      .collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getDouble(0)),
        if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(got.forall { case (n, f) => n == f }, got.mkString(", "))
    assert(got.map(_._1).toSeq ==
      Seq(Some(11.0), None, Some(0.0), None))
  }

  test("fused cosine is bit-identical to the composed dot/norm form") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cmp = e.crossJoin(broadcast(
        e.filter(col("vec_id") === 0).select(col("embedding").as("q"))))
      .select(
        Similarity.cosine(col("embedding"), col("q")).as("fused"),
        Similarity.cosineComposed(col("embedding"), col("q")).as("composed"))
      .filter(col("fused") =!= col("composed") ||
        col("fused").isNull =!= col("composed").isNull)
    assert(cmp.count() == 0)
  }

  test("fused cosine edge cases match the composed form") {
    import spark.implicits._
    val rows = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),   // identical: 1.0
      (Array(1.0f), Array(3.0f, 4.0f)))          // length mismatch: null
      .toDF("a", "b")
    val got = rows.select(
        Similarity.cosine(col("a"), col("b")).as("f"),
        Similarity.cosineComposed(col("a"), col("b")).as("c"))
      .collect()
    got.foreach { r =>
      val f = if (r.isNullAt(0)) None else Some(r.getDouble(0))
      val c = if (r.isNullAt(1)) None else Some(r.getDouble(1))
      assert(f.map(java.lang.Double.doubleToLongBits(_)) ==
        c.map(java.lang.Double.doubleToLongBits(_)), s"$f vs $c")
    }
  }

  test("fused cosine survives a zero-norm vector where ANSI composed throws") {
    import spark.implicits._
    val rows = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val fused = rows.select(Similarity.cosine(col("a"), col("b")).as("f"))
      .collect().head
    assert(!fused.isNullAt(0) && fused.getDouble(0).isNaN)
    // the composed form under ANSI (Spark 4 default) kills the whole job
    val thrown = intercept[Exception] {
      rows.select(Similarity.cosineComposed(col("a"), col("b"))).collect()
    }
    assert(thrown.getMessage.contains("DIVIDE_BY_ZERO"), thrown.getMessage)
  }

  test("non-float array inputs fail analysis, not silently return garbage") {
    import spark.implicits._
    val doubles = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    for (f <- Seq(
        graft.functions.FloatVecDot.float_vec_dot _,
        graft.functions.FloatVecCosine.float_vec_cosine _)) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        doubles.select(f(col("a"), col("b"))).collect()
      }
      assert(e.getMessage.contains("ARRAY<FLOAT>"), e.getMessage)
    }
  }

  test("native dot compiles under codegen with fallback disabled") {
    val prior = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val n = e.crossJoin(broadcast(
          e.filter(col("vec_id") === 0).select(col("embedding").as("q"))))
        .select(Similarity.dot(col("embedding"), col("q")).as("d"))
        .filter(col("d").isNotNull).count()
      assert(n > 0)
    } finally spark.conf.set("spark.sql.codegen.fallback", prior)
  }
}

/** nprobe semantics of the k-NN join: the query's own cell is always
  * probed (nprobe=1 IS the oracle contract), and on a near-cell-boundary
  * fixture probing a second cell strictly improves the result. */
class KnnJoinNprobeSpec extends AnyFunSuite {
  import SparkTestSession._

  test("nprobe=2 strictly dominates nprobe=1 on a cell-boundary fixture") {
    import spark.implicits._
    // query 0 lives in cell "a" but its true nearest neighbors sit in "b"
    val emb = Seq(
      (0L, "a", Array(1.0f, 0.0f, 0.0f, 0.0f)),   // query, near a/b boundary
      (1L, "a", Array(0.0f, 1.0f, 0.0f, 0.0f)),   // own-cell member, sim 0
      (2L, "b", Array(0.90f, 0.10f, 0.0f, 0.0f)), // true NN candidates
      (3L, "b", Array(0.95f, 0.05f, 0.0f, 0.0f)),
      (4L, "c", Array(0.0f, 0.0f, 1.0f, 0.0f)))   // decoy far cell
      .toDF("vec_id", "label", "embedding")
    val queries = emb.filter(col("vec_id") === 0)

    val np1 = graft.llm.Similarity.knnJoin(emb, queries, k = 5, nprobe = 1)
      .collect()
    // own-cell contract: only vec 1 is reachable
    assert(np1.map(_.getAs[Long]("vec_id")).toSet == Set(1L))

    val np2 = graft.llm.Similarity.knnJoin(emb, queries, k = 5, nprobe = 2)
      .collect()
    val ids2 = np2.map(_.getAs[Long]("vec_id")).toSet
    // superset of nprobe=1, and the second probed cell is "b" (nearest
    // centroid), not the decoy "c"
    assert(ids2 == Set(1L, 2L, 3L), ids2)
    // strict domination: the top hit under nprobe=2 beats nprobe=1's best
    val top1 = np2.minBy(_.getAs[Int]("rnk"))
    assert(top1.getAs[Long]("vec_id") == 3L)
    assert(top1.getAs[Double]("cos_sim") >
      np1.head.getAs[Double]("cos_sim"))
  }
}

/** Differential test for the distributed Lloyd k-means quantizer. */
class IvfTrainSpec extends AnyFunSuite {
  import SparkTestSession._

  test("distributed ivfTrain matches a driver-side reference k-means") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    val k = 4
    def assign(cent: Map[Int, Array[Double]]): Map[Long, Int] =
      vecs.map { case (id, v) =>
        id -> cent.toSeq.map { case (cid, c) =>
          (v.zip(c).map(p => (p._1 - p._2) * (p._1 - p._2)).sum, cid)
        }.min._2
      }.toMap
    var cent = vecs.filter(_._1 < k)
      .map { case (id, v) => id.toInt -> v }.toMap
    for (_ <- 1 to 2) {
      val a = assign(cent)
      cent = vecs.groupBy { case (id, _) => a(id) }.map { case (cid, vs) =>
        cid -> vs.map(_._2).transpose.map(xs => xs.sum / xs.length).toArray
      }
    }
    val expected = assign(cent)
    val got = graft.llm.Similarity.ivfTrain(emb).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cluster")).toMap
    assert(got == expected)
    // training did something: more than one non-empty cluster
    assert(got.values.toSet.size > 1)
  }

  test("an emptied cluster keeps its centroid; k is preserved (VERDICT r5 #4)") {
    import spark.implicits._
    // duplicate seed vectors: ids 0 and 1 both sit at [0], so round 1
    // ties every near-zero vector into cid 0 and cid 1 empties — the
    // retained centroid must then win id 0/1 back in the final assign
    val emb = Seq(
      (0L, Array(0.0f)), (1L, Array(0.0f)),
      (2L, Array(10.0f)), (3L, Array(4.0f)))
      .toDF("vec_id", "embedding")
    val got = graft.llm.Similarity.ivfTrain(emb, k = 3, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("cluster")).toMap
    // cid1 retained [0]: ids 0,1 land there; cid0 moved to 4/3 serves id 3
    assert(got == Map(0L -> 1, 1L -> 1, 2L -> 2, 3L -> 0), got)
    assert(got.values.toSet.size == 3) // k survived the empty round
  }

  test("seeding uses the k lowest ACTUAL vec_ids, not ids < k (ADVICE r5)") {
    import spark.implicits._
    val vecs = Seq(
      Array(0.0f, 0.0f), Array(0.1f, 0.0f), Array(5.0f, 5.0f),
      Array(5.1f, 5.0f), Array(0.0f, 0.2f), Array(5.0f, 5.2f))
    def train(base: Long) = graft.llm.Similarity.ivfTrain(
      vecs.zipWithIndex.map { case (v, i) => (base + i, v) }
        .toDF("vec_id", "embedding"), k = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("cluster")).toMap
    val zeroBased = train(0L)
    val shifted = train(100L)
    // identical training up to the id shift — the shifted frame used to
    // find ZERO seeds (vec_id < k matches nothing) and train degenerate
    assert(shifted == zeroBased.map { case (id, c) => (id + 100L) -> c })
    assert(zeroBased.values.toSet.size == 2)
  }

  test("spread init degrades gracefully: duplicate-heavy and empty inputs") {
    import spark.implicits._
    // all vectors identical: oversampling admits nothing (total d2 = 0),
    // the pool holds one candidate — the fill must still produce k
    // centroids instead of silently training a smaller quantizer
    val dup = (0L to 5L).map(i => (i, Array(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = graft.llm.Similarity.ivfTrain(dup, k = 3, init = "spread")
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("cluster")).toMap
    assert(got.keySet == (0L to 5L).toSet)
    // identical vectors all tie into the lowest cid
    assert(got.values.forall(_ == 0), got)
    // empty frame: no NPE, empty result — same contract as init="lowest"
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(graft.llm.Similarity.ivfTrain(empty, k = 2, init = "spread")
      .collect().isEmpty)
  }

  test("spread init separates groups the lowest-id seeds cannot see") {
    import spark.implicits._
    // the 3 lowest ids all sit in group A — ingest order is not geometry;
    // k-means|| oversampling must still seed B and C
    val emb = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(0.1f, 0.0f)),
      (2L, Array(0.0f, 0.1f)),
      (3L, Array(50.0f, 50.0f)), (4L, Array(50.0f, 50.2f)),
      (5L, Array(100.0f, 100.0f)), (6L, Array(100.0f, 100.2f)))
      .toDF("vec_id", "embedding")
    def run() = graft.llm.Similarity.ivfTrain(emb, k = 3, init = "spread")
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("cluster")).toMap
    val got = run()
    assert(got == run()) // derandomized: replay-identical
    val groups = Seq(Seq(0L, 1L, 2L), Seq(3L, 4L), Seq(5L, 6L))
      .map(_.map(got).toSet)
    assert(groups.forall(_.size == 1), s"group split across clusters: $got")
    assert(groups.flatten.toSet.size == 3, s"groups merged: $got")
  }
}

/** Composition: train → assign → probe, with recall against brute force. */
class KnnTrainedSpec extends AnyFunSuite {
  import SparkTestSession._

  test("trained-cell k-NN join returns top-k per query without cartesian") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 4)
    val out = graft.llm.Similarity.knnJoinTrained(emb, queries,
      k = 5, nprobe = 2)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"trained ANN degenerated:\n$p")
    val rows = out.collect()
    val perQuery = rows.groupBy(_.getAs[Long]("q_id"))
    assert(perQuery.keySet == Set(0L, 1L, 2L, 3L))
    assert(perQuery.values.forall(_.length == 5))
    // sanity recall: for each query, nprobe=2 over trained cells finds at
    // least one of the brute-force top-5
    val brute = emb.crossJoin(broadcast(
        queries.select(col("vec_id").as("q_id"),
          col("embedding").as("q_emb"))))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        graft.llm.Similarity.cosine(col("embedding"), col("q_emb")).as("s"))
      .collect().groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) =>
        q -> rs.sortBy(-_.getAs[Double]("s")).take(5)
          .map(_.getAs[Long]("vec_id")).toSet }
    perQuery.foreach { case (q, rs) =>
      val got = rs.map(_.getAs[Long]("vec_id")).toSet
      assert(got.intersect(brute(q)).nonEmpty,
        s"query $q: no overlap with brute-force top-5")
    }
  }
}

/** Product-quantization family: codebook shape, code determinism, and a
  * driver-side ADC recomputation (exactness vs DuckDB is oracle-pinned). */
class PqSpec extends AnyFunSuite {
  import SparkTestSession._

  test("PQ codebooks/codes/ADC are consistent and deterministic") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cb = graft.llm.Similarity.pqTrain(emb).collect()
    val byM = cb.groupBy(_.getAs[Int]("m"))
    assert(byM.keySet == (0 until 4).toSet)
    byM.values.foreach { rows =>
      assert(rows.map(_.getAs[Int]("cid")).toSet == (0 until 8).toSet)
      rows.groupBy(_.getAs[Int]("cid")).values
        .foreach(cw => assert(cw.map(_.getAs[Int]("i")).toSet ==
          (0 until 16).toSet))
    }
    val codes = graft.llm.Similarity.pqEncode(emb).collect()
      .map(r => r.getLong(0) -> (1 to 4).map(r.getInt)).toMap
    assert(codes.size == emb.count())
    assert(codes.values.forall(_.forall(c => c >= 0 && c < 8)))
    // replay-identical (hash seeds, rank init, deterministic ties)
    val again = graft.llm.Similarity.pqEncode(emb).collect()
      .map(r => r.getLong(0) -> (1 to 4).map(r.getInt)).toMap
    assert(again == codes)

    // differential: recompute ADC on the driver from codebooks + codes
    // with the same fixed i-order fold
    val adc = graft.llm.Similarity.pqAdc(emb).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val q = emb.filter(col("vec_id") === 0).collect().head
      .getAs[Seq[Float]]("embedding").map(_.toDouble).toArray
    val cwords = cb.groupBy(r => (r.getAs[Int]("m"), r.getAs[Int]("cid")))
      .view.mapValues(_.sortBy(_.getAs[Int]("i"))
        .map(_.getAs[Double]("c")).toArray).toMap
    val dt = cwords.map { case ((s, cid), w) =>
      (s, cid) -> w.zipWithIndex.foldLeft(0.0) { case (acc, (c, i)) =>
        val diff = q(s * 16 + i) - c; acc + diff * diff
      }
    }
    codes.foreach { case (vid, cs) =>
      if (vid != 0L) {
        val expect = BigDecimal(
          cs.zipWithIndex.map { case (c, s) => dt((s, c)) }.reduce(_ + _))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(adc(vid) - expect) < 1e-12, s"vec $vid")
      }
    }
  }

  test("ivfPqSearch prunes to probed cells; results nested in nprobe") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    graft.store.ModelStore.scratch(spark, "ivfpq-spec") { store =>
      graft.llm.Similarity.saveIvfPqIndex(emb, store)
      val cells = store.load("cells").collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cid")).toMap
      val qv = graft.llm.Similarity.queryVecOf(emb, 0L)
      // nprobe = 1: every result lives in the query's own coarse cell
      // (the index's OWN unit-domain assignment, not the raw-domain
      // ivfTrain — the two train in different metric spaces)
      val own = graft.llm.Similarity
        .ivfPqSearchPersisted(store, qv, qId = 0L, nprobe = 1)
        .collect().map(_.getLong(0))
      assert(own.nonEmpty)
      own.foreach(id => assert(cells(id) == cells(0L), s"$id outside own cell"))
      // per-cell shortlists make candidate sets nested in nprobe, and
      // the exact rerank ranks supersets consistently: every true
      // neighbor served at nprobe=n stays served at nprobe>n
      val hits = Seq(1, 2, 4).map { np =>
        graft.llm.Similarity
          .ivfPqSearchPersisted(store, qv, qId = 0L, nprobe = np)
          .collect().map(_.getLong(0)).toSet
      }
      val truth = graft.llm.Similarity.cosineTopK(spark, sfDir, 0L, 10)
        .collect().map(_.getLong(0)).toSet
      hits.sliding(2).foreach { case Seq(a, b) =>
        assert((a & truth).subsetOf(b & truth),
          s"true neighbors lost when widening the probe: $a vs $b")
      }
      // the probe is PHYSICAL: codes are cell-partitioned, so the cell
      // filter is a PartitionFilter (reads nprobe/nlist of the
      // directories) and no join ships the codes table anywhere — the
      // difference between an index probe and a corpus pass at 100 TB
      val pplan = graft.llm.Similarity
        .ivfPqSearchPersisted(store, qv, qId = 0L, nprobe = 1)
        .queryExecution.executedPlan.toString
      // the cell predicate lands in PartitionFilters (nprobe=1 prints as
      // [isnotnull(cid), (cid = N)]; wider probes as [cid IN (...)])
      assert("""PartitionFilters: \[[^\]]*cid""".r
        .findFirstIn(pplan).isDefined, pplan)
      assert(!pplan.contains("SortMergeJoin"), pplan)
      store.load("cells")
    }
  }
}

/** Differential + plan-shape tests for the JL random projection. */
class JlProjectSpec extends AnyFunSuite {
  import SparkTestSession._

  private def md5w(j: Int, i: Int): Float = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$j#$i".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 15)
    (((java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L) / 1000.0).toFloat
  }

  test("jlProject matches a driver-side fixed-order fold bit-exactly") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val got = Similarity.jlProject(emb).collect()
    val raw = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(got.length == raw.size)
    got.foreach { r =>
      val v = raw(r.getLong(0))
      (0 until 16).foreach { j =>
        var acc = 0.0
        v.indices.foreach(i => acc += v(i).toDouble * md5w(j, i).toDouble)
        val want = BigDecimal(acc)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getDouble(1 + j) == want, s"vec ${r.getLong(0)} y$j")
      }
    }
  }

  test("jlProject plan is a pure projection: no hash exchange, no aggregate") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val plan = Similarity.jlProject(emb).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("HashAggregate"), plan)
  }
}

/** Differential + eigen-property tests for the PCA power-iteration op. */
class PcaSpec extends AnyFunSuite {
  import SparkTestSession._

  test("pcaPower agrees with a driver-side recompute; direction dominates axes") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val dim = vecs.head._2.length
    // driver reference: exact same algorithm, Gram summed locally (sum
    // order differs from the distributed partials -> compare with a
    // tolerance far above ulp noise, far below the signal)
    val gm = Array.ofDim[Double](dim, dim)
    vecs.foreach { case (_, x) =>
      var i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) { gm(i)(j) += x(i) * x(j); j += 1 }
        i += 1
      }
    }
    var v = Array.fill(dim)(1.0)
    (1 to 3).foreach { _ =>
      v = Array.tabulate(dim) { i =>
        var acc = 0.0
        var j = 0
        while (j < dim) { acc += gm(i)(j) * v(j); j += 1 }
        acc
      }
    }
    var piv = 0.0
    v.foreach(x => if (math.abs(x) > math.abs(piv)) piv = x)
    val s = v.map(_ / piv)
    val got = graft.llm.Similarity.pcaPower(emb).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    vecs.foreach { case (id, x) =>
      val want = x.indices.foldLeft(0.0)((a, i) => a + x(i) * s(i).toFloat)
      assert(math.abs(got(id) - want) < 1e-4, s"vec $id: ${got(id)} vs $want")
    }
    // dominant-direction property: variance along the found component
    // (unit-normalized) exceeds the variance along every coordinate axis
    val n = vecs.length.toDouble
    val norm = math.sqrt(s.map(x => x * x).sum)
    val proj = vecs.map { case (_, x) =>
      x.indices.foldLeft(0.0)((a, i) => a + x(i) * s(i)) / norm }
    def variance(xs: Seq[Double]): Double = {
      val m = xs.sum / n
      xs.map(x => (x - m) * (x - m)).sum / n
    }
    val vProj = variance(proj.toSeq)
    (0 until dim).foreach { i =>
      val vAxis = variance(vecs.map(_._2(i)).toSeq)
      assert(vProj >= vAxis - 1e-9, s"axis $i variance $vAxis > pc1 $vProj")
    }
  }
}

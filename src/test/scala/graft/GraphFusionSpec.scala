package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{FuzzyJoin, Graphs}
import graft.llm.{Fusion, Sampling}

/** Semantics + plan shapes of the round-7 additions: triangle counting,
  * blocked fuzzy ER, two-phase global ranks / RRF fusion, epoch plan. */
class GraphFusionSpec extends AnyFunSuite {
  import SparkTestSession._

  private def edgesOf(rows: (Long, Long)*) = {
    val s = spark; import s.implicits._
    rows.toDF("u", "v")
  }

  test("triangleCountsOf: two triangles sharing an edge, pendant edge ignored") {
    // {1,2,3} and {2,3,4} share edge (2,3); (5,6) is triangle-free
    val e = edgesOf((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (5L, 6L))
    val got = Graphs.triangleCountsOf(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L), got)
  }

  test("triangleCountsOf: degree orientation equals naive id orientation") {
    // deterministic pseudo-random graph with hubs: edge (a,b) kept when
    // (a*31+b) mod 5 < 2 — dense enough for hundreds of triangles
    val ids = (0L until 40L)
    val e = edgesOf(ids.flatMap(a => ids.filter(b => b > a &&
      (a * 31 + b) % 5 < 2).map(b => (a, b))): _*)
    val fast = Graphs.triangleCountsOf(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // naive: orient by id only (u<v<w), count closures
    val naive = e.as("e1")
      .join(e.as("e2"), col("e1.v") === col("e2.u"))
      .join(e.as("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .select(explode(array(col("e1.u"), col("e1.v"), col("e2.v")))
        .as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty && fast == naive,
      s"fast=${fast.size} naive=${naive.size}")
  }

  test("copurchaseEdges: support threshold keeps only repeated pairs") {
    val s = spark; import s.implicits._
    // orders: (1,2) together twice, (1,3) once, 2 alone once
    val dir = java.nio.file.Files.createTempDirectory("cp").toString
    Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L), (12L, 1L), (12L, 3L),
      (13L, 2L), (10L, 2L)) // duplicate membership must not double-count
      .toDF("l_orderkey", "l_partkey").write.parquet(s"$dir/lineitem.parquet")
    val got = Graphs.copurchaseEdges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)), got)
  }

  test("q_triangle_count and q_fuzzy_join plan without cartesian products") {
    for (q <- Seq("q_triangle_count", "q_fuzzy_join")) {
      val p = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$q degenerated:\n$p")
    }
  }

  private def partsOf(rows: (Long, String, Int)*) = {
    val s = spark; import s.implicits._
    rows.toDF("id", "nm", "p_size")
  }

  test("fuzzyResolveOf: within-block edit-distance matches, best by (dist, id)") {
    val p = partsOf(
      (1L, "red bolt", 10), (2L, "red bolt", 11),  // dist 0
      (3L, "ted bolt", 12),                        // dist 1 of "red bolt"
      (4L, "red gear", 10),                        // different block (noun)
      (5L, "red bolt", 40))                        // same noun, far band
    val got = FuzzyJoin.fuzzyResolveOf(p).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // 1: matches 2 (d0) and 3 (d2→ actually d1); best = (0, 2)
    assert(got(1L) == (2L, 2L, 0L), got(1L))
    assert(got(2L) == (2L, 1L, 0L), got(2L))
    assert(got(3L)._1 == 2L && got(3L)._2 == 1L && got(3L)._3 == 1L, got(3L))
    assert(got(4L) == (0L, -1L, -1L), got(4L)) // alone in its block
    assert(got(5L) == (0L, -1L, -1L), got(5L)) // banding recall tradeoff
  }

  test("erClustersOf: transitive closure merges A≈B≈C even when A and C miss the bound") {
    val p = partsOf(
      (1L, "abcdef gg", 10), // lev(1,2)=2, lev(2,3)=2, lev(1,3)=4
      (2L, "abcdxx gg", 10),
      (3L, "abxxxx gg", 10),
      (4L, "zzzzzz gg", 10)) // same block, far from everything
    val got = FuzzyJoin.erClustersOf(p).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(1L) == (1L, 3L, true), got(1L))
    assert(got(2L) == (1L, 3L, false), got(2L))
    assert(got(3L) == (1L, 3L, false), got(3L)) // via 2 only
    assert(got(4L) == (4L, 1L, true), got(4L)) // singleton cluster
  }

  test("fuzzyResolveOf: distance and size-diff thresholds verify inside the block") {
    val p = partsOf(
      (1L, "aaa bolt", 1), (2L, "zzz bolt", 2),   // same block, dist 3 > 2
      (3L, "aaa bolt", 7))                        // same band, |Δsize| 6 > 3
    val got = FuzzyJoin.fuzzyResolveOf(p).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L), got)
  }

  test("globalRank: two-phase bucket ranks equal the naive global window") {
    val s = spark; import s.implicits._
    val docs = Tables.t(spark, sfDir, "documents")
    val sig = docs.select(col("doc_id"), length(col("text")).as("k"))
    val fast = Fusion.globalRank(sig, col("k"), col("doc_id"),
      col("k") / 16, "r").select("doc_id", "r").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val naive = sig.withColumn("r", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("k").desc, col("doc_id").asc)))
      .select("doc_id", "r").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong)).toMap
    assert(fast == naive)
  }

  test("assocRulesOf: confidence and lift from exact basket counts") {
    val s = spark; import s.implicits._
    // orders: {a,b,c}, {a,b}, {a,c}, {b} → pairs (a,b):2 (a,c):2 (b,c):1
    val li = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"), (4L, "b")).toDF("ok", "p")
    val got = Graphs.assocRulesOf(li).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6)))).toMap
    assert(got.size == 4) // (b,c) misses support 2; 2 pairs × 2 dirs
    assert(got(("a", "b")) == (2L, 3L, 3L, 2.0 / 3.0, 8.0 / 9.0))
    assert(got(("c", "a")) == (2L, 2L, 3L, 1.0, 4.0 / 3.0))
  }

  test("kCoreOf: the tail peels off in rounds, the clique survives") {
    val s = spark; import s.implicits._
    // K4 on {1,2,3,4} plus a tail 4—5—6
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("u", "v")
    // k=3: node 6 peels first, THEN 5 (two rounds — the iterative part)
    assert(Graphs.kCoreOf(e, 3).collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L, 3L, 4L))
    // k=4 empties the graph
    assert(Graphs.kCoreOf(e, 4).collect().isEmpty)
    // k=1 keeps everything
    assert(Graphs.kCoreOf(e, 1).collect().length == 6)
  }

  test("graphSummaryOf: square plus one diagonal degree profile") {
    val s = spark; import s.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L))
      .toDF("u", "v")
    val r = Graphs.graphSummaryOf(e).collect().head
    // degrees: 3,2,3,2 → min 2, max 3, avg 2.5, p50 2.5, p90 3.0
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (4L, 5L, 2L, 3L))
    assert(r.getDouble(4) == 2.5 && r.getDouble(5) == 2.5 &&
      r.getDouble(6) == 3.0, r)
  }

  test("itemsets3Of: Apriori prune is lossless, infrequent triples drop") {
    val s = spark; import s.implicits._
    // {1,2,3} twice, {1,2,4} once → only (1,2,3) clears support 2;
    // the (1,4)/(2,4) pairs are infrequent so the 124 triple is pruned
    // before counting (and would fail support anyway)
    val li = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 1L), (3L, 2L), (3L, 4L)).toDF("ok", "p")
    val got = Graphs.itemsets3Of(li).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 2L, 3L, 2L)), got.toSeq)
  }

  test("clusteringCoefOf: square plus one diagonal") {
    val s = spark; import s.implicits._
    // triangles {1,2,3} and {1,3,4}: nodes 2/4 are closed (coef 1),
    // hubs 1/3 have one open wedge (coef 2/3)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L))
      .toDF("u", "v")
    val got = Graphs.clusteringCoefOf(e).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == (3L, 2L, 2.0 / 3.0), got(1L))
    assert(got(2L) == (2L, 1L, 1.0))
    assert(got(3L) == (3L, 2L, 2.0 / 3.0))
    assert(got(4L) == (2L, 1L, 1.0))
  }

  test("groupedRank equals the naive per-group window; quantileNorm spans [0,1]") {
    val s = spark; import s.implicits._
    val docs = Tables.t(spark, sfDir, "documents")
    val sig = docs.select(col("doc_id"), col("source"),
      length(col("text")).as("k"))
    val fast = Fusion.groupedRank(sig, "source", col("k"), col("doc_id"),
      col("k") / 16, "r").select("doc_id", "r").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val naive = sig.withColumn("r", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy("source")
        .orderBy(col("k").desc, col("doc_id").asc)))
      .select("doc_id", "r").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong)).toMap
    assert(fast == naive)
    // quantileNorm: every multi-doc source spans exactly [0, 1]
    val qn = Fusion.quantileNormOf(docs).collect()
      .map(r => (r.getString(1), r.getDouble(3)))
    val bySrc = qn.groupBy(_._1)
    bySrc.foreach { case (src, rows) =>
      assert(rows.map(_._2).max == 1.0, src)
      assert(rows.map(_._2).min == 0.0, src)
    }
  }

  test("groupedRank keeps NULL-group rows, ranked as their own group") {
    val s = spark; import s.implicits._
    val sig = Seq((1L, Some("a"), 10), (2L, Some("a"), 5),
      (3L, None: Option[String], 7), (4L, None: Option[String], 9))
      .toDF("doc_id", "source", "k")
    val got = Fusion.groupedRank(sig, "source", col("k"), col("doc_id"),
      lit(0), "r").select("doc_id", "source", "r").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    // window PARTITION BY source semantics: NULL is one partition, its
    // rows RETAINED (pre-fix the equi-join on the group key dropped
    // them — ADVICE r7); source column itself stays NULL in the output
    assert(got == Map(1L -> 1L, 2L -> 2L, 4L -> 1L, 3L -> 2L), got)
  }

  test("quantileNorm keeps NULL-source docs as their own partition") {
    val s = spark; import s.implicits._
    // pre-fix the counts join on `source` was null-UNSAFE and silently
    // dropped the NULL partition even though groupedRank retained it
    // (ADVICE r8) — pin the full output including the NULL group
    val docs = Seq(
      (1L, Some("a"), "one two three four"),
      (2L, Some("a"), "one two"),
      (3L, None: Option[String], "one two three"),
      (4L, None: Option[String], "one"),
      (5L, None: Option[String], "one two three four five"))
      .toDF("doc_id", "source", "text")
    val got = Fusion.quantileNormOf(docs).collect()
      .map(r => (r.getLong(0),
        (if (r.isNullAt(1)) null else r.getString(1), r.getDouble(3))))
      .toMap
    assert(got == Map(
      1L -> ("a", 1.0), 2L -> ("a", 0.0),
      3L -> (null, 0.5), 4L -> (null, 0.0), 5L -> (null, 1.0)), got)
  }

  test("rrfFusion windows partition by bucket — no SinglePartition window") {
    val df = Fusion.rrfFusion(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    val windowLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.nonEmpty &&
      windowLines.forall(!_.contains("SinglePartition")),
      s"corpus-wide window:\n${windowLines.mkString("\n")}")
    val top = df.limit(3).collect()
    assert(top.length == 3 && top(0).getDouble(4) >= top(2).getDouble(4))
  }

  test("textRankOf: the hub word of a star-shaped corpus ranks first") {
    val s = spark; import s.implicits._
    // "data" is adjacent to every other content word; stopwords and
    // short words never become vertices
    val docs = Seq(
      (1L, "data quality gates the data pipeline"),
      (2L, "data curation and data sampling"),
      (3L, "tokenizer data with a tiny xy"))
      .toDF("doc_id", "text")
    val got = llm.Keywords.textRankOf(docs, k = 10).collect()
    assert(got.head.getString(0) == "data", got.map(_.getString(0)).toSeq)
    assert(!got.map(_.getString(0)).exists(w =>
      w == "the" || w == "and" || w == "xy"), got.map(_.getString(0)).toSeq)
    // ranks are PageRank output: all positive, hub strictly above tail
    assert(got.forall(_.getDouble(1) > 0) &&
      got.head.getDouble(1) > got.last.getDouble(1))
  }

  test("weightedSample: deterministic and length-biased vs the corpus") {
    val docs = Tables.t(spark, sfDir, "documents")
    val s1 = Sampling.weightedSampleOf(docs, k = 100).collect()
      .map(_.getLong(0)).toSeq
    val s2 = Sampling.weightedSampleOf(docs, k = 100).collect()
      .map(_.getLong(0)).toSeq
    assert(s1 == s2 && s1.length == 100) // pure function of (id, weight)
    val sampleMean = Sampling.weightedSampleOf(docs, k = 100)
      .agg(avg("w")).head().getDouble(0)
    val corpusMean = docs.agg(avg(col("n_chars").cast("double")))
      .head().getDouble(0)
    assert(sampleMean > corpusMean, // longer docs drawn more often
      s"sample mean $sampleMean vs corpus $corpusMean")
  }

  test("linreg: the fitted line minimizes squared error (perturbation check)") {
    val rows = SparkEntry.queries("q_linreg")(spark, sfDir).collect()
    val data = Tables.t(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_discount").cast("double"),
        col("l_quantity").cast("double")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val (flag, slope, icept) = (r.getString(0), r.getDouble(1),
        r.getDouble(2))
      def sse(a: Double, b: Double): Double =
        data(flag).map { case (_, x, y) => val e = y - (a * x + b); e * e }.sum
      val best = sse(slope, icept)
      for (da <- Seq(-0.05, 0.05); db <- Seq(-0.05, 0.05))
        assert(best <= sse(slope + da, icept + db), s"$flag not optimal")
    }
  }

  test("epochPlan: weights normalize, epochs capped, realized consistent") {
    val rows = Sampling.epochPlan(spark, sfDir).collect()
    assert(rows.length == 20)
    val wsum = rows.map(_.getDouble(2)).sum
    assert(math.abs(wsum - 1.0) < 1e-9, wsum)
    rows.foreach { r =>
      val (avail, e, real) = (r.getLong(1), r.getDouble(3), r.getLong(4))
      assert(e > 0 && e <= 4.0, r)
      assert(real == math.floor(e * avail).toLong, r)
    }
    // budget 2× with √-tempered weights must over-sample at least one
    // below-average source past 2 epochs
    assert(rows.exists(_.getDouble(3) > 2.0))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape guardrails: the properties that make these queries survive a
  * 100× scale-up (pushdown, broadcast, partial agg, top-k short-circuit).
  * A green result here means Catalyst produced the plan we designed for,
  * not just any plan that returns the right rows. */
class PlanSpec extends AnyFunSuite {
  import SparkTestSession._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("batched k-NN serves broadcast-only: no sort-merge of the codes table (raw + residual)") {
    // the probe list arrives through a window, so Catalyst cannot size
    // it — without the explicit broadcast hint the candidate join
    // sort-merges, i.e. shuffles AND sorts the corpus-sized codes table
    // by cell (caught by plan audit in round 12; this guard keeps a
    // future stats/Catalyst change from silently reintroducing it)
    for (name <- Seq("q_ivfpq_batch", "q_ivfpq_batch_residual")) {
      val p = plan(name)
      assert(!p.contains("SortMergeJoin"), s"$name sort-merges:\n$p")
      assert(!p.contains("CartesianProduct"), name)
      assert(!p.contains("SinglePartition"), name)
    }
  }

  test("q_filter_project pushes predicates and prunes columns at the scan") {
    val p = plan("q_filter_project")
    assert(p.contains("PushedFilters:") &&
      p.contains("l_returnflag"), s"no pushed filters:\n$p")
    assert(p.contains("ReadSchema") && !p.contains("l_extendedprice"),
      "scan reads pruned column l_extendedprice")
  }

  test("dimension joins broadcast (q_join_inner, q_join_multi)") {
    assert(plan("q_join_inner").contains("BroadcastHashJoin"))
    val multi = plan("q_join_multi")
    assert(multi.contains("BroadcastHashJoin"))
    // the only shuffle join allowed is lineitem⋈orders
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(multi).size <= 1,
      s"more than one shuffled join in star query:\n$multi")
  }

  test("q1_agg does map-side partial aggregation inside codegen") {
    val p = plan("q1_agg")
    assert(p.contains("partial_sum"), "no map-side partial aggregation")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "no partial+final aggregate pair")
    // codegen spans appear once AQE finalizes — execute, then inspect
    val df = SparkEntry.queries("q1_agg")(spark, sfDir)
    df.collect()
    // codegen stages print as "*(n)" in the finalized adaptive plan
    assert(df.queryExecution.executedPlan.toString.contains("*("),
      "no whole-stage-codegen stage in final plan")
  }

  test("q_topk plans TakeOrderedAndProject (no global sort)") {
    val p = plan("q_topk")
    assert(p.contains("TakeOrderedAndProject"), s"global sort instead:\n$p")
  }

  test("q_cosine_topk broadcasts the query vector and takes ordered k") {
    val p = plan("q_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q_minhash_lsh generates candidates via equi-join, not cartesian") {
    val p = plan("q_minhash_lsh")
    assert(!p.contains("CartesianProduct"),
      s"LSH candidate generation degenerated to a cross product:\n$p")
  }

  test("documents scans prune to the referenced columns (q_token_stats)") {
    val p = plan("q_token_stats")
    // only doc_id + text are referenced; lang/source/text metadata columns
    // must not reach the parquet reader
    assert(p.contains("ReadSchema"), s"no scan in plan:\n$p")
    assert(!p.contains("source"), s"scan reads unreferenced column source:\n$p")
  }

  test("q_ngram_jaccard candidates come from an equi-join, not cartesian") {
    val p = plan("q_ngram_jaccard")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"),
      s"prefix-filter candidate generation degenerated:\n$p")
  }

  test("q_ann_pairs buckets join equi, not cartesian") {
    val p = plan("q_ann_pairs")
    assert(!p.contains("CartesianProduct"),
      s"sign-LSH bucket join degenerated to a cross product:\n$p")
  }

  test("q_knn_join probes cells via equi-join, not cartesian") {
    val p = plan("q_knn_join")
    assert(!p.contains("CartesianProduct"),
      s"k-NN join degenerated to a cross product:\n$p")
  }

  test("q_decontaminate probes benchmark shingles with a broadcast semi-join") {
    val p = plan("q_decontaminate")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"decontamination shingle probe degenerated:\n$p")
    assert(p.contains("BroadcastExchange"),
      s"benchmark shingle side is not broadcast:\n$p")
  }

  test("q_curation_e2e composes without cartesian products") {
    val p = plan("q_curation_e2e")
    assert(!p.contains("CartesianProduct"),
      s"curation pipeline degenerated to a cross product:\n$p")
  }

  test("q_stratified_sample scan prunes to (doc_id, lang) — never text") {
    val p = plan("q_stratified_sample")
    assert(p.contains("ReadSchema"), s"no scan in plan:\n$p")
    assert(!p.contains("text"),
      s"id-rank sampling must not read the text column:\n$p")
  }

  test("q_hash_split is a pure projection: no exchange before the sort") {
    val df = SparkEntry.queries("q_hash_split")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    // the only exchange allowed is the final presentation ORDER BY
    assert(!p.contains("hashpartitioning"),
      s"split assignment shuffled — must stay a projection:\n$p")
  }

  test("generic as-of join shuffles once on the union key (q_asof_join)") {
    val p = plan("q_asof_join")
    assert("Exchange hashpartitioning\\(_k".r.findAllIn(p).size == 1,
      s"expected exactly one hash exchange on the as-of key:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoop"),
      "as-of degenerated into a join")
  }

  test("as-of lag shuffles once on the key (q_asof_lag)") {
    val p = plan("q_asof_lag")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      s"expected exactly one hash exchange on user_id:\n$p")
  }

  test("k-NN join with nprobe=2 stays equi-join + broadcast centroids") {
    val emb = graft.Tables.t(spark, sfDir, "embeddings")
    val p = graft.llm.Similarity
      .knnJoin(emb, emb.filter(org.apache.spark.sql.functions
        .col("vec_id") < 8), k = 5, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"nprobe cell fan-out degenerated to a cross product:\n$p")
    // the centroid table (nlist rows) must be the broadcast side
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"centroid ranking did not broadcast the tiny side:\n$p")
  }

  test("q_line_dedup scan prunes to (doc_id, text); winners via partial agg") {
    val p = plan("q_line_dedup")
    assert(p.contains("ReadSchema"), s"no scan in plan:\n$p")
    assert(!p.contains("source"),
      s"line dedup must not read unreferenced columns:\n$p")
    assert(!p.contains("CartesianProduct"))
    // the first-occurrence winner must be a partial-aggregated min, never
    // a window sort over every occurrence of a (possibly hot) line
    assert(p.contains("partial_min"),
      s"winner selection lost its map-side partial min:\n$p")
  }

  test("q_sequence_pack windows per shard — no single-partition global sort") {
    val p = plan("q_sequence_pack")
    // the packing window must partition by shard; a global running sum
    // would show as an Exchange SinglePartition before the window
    assert(p.contains("hashpartitioning(shard"),
      s"packing window is not shard-partitioned:\n$p")
    val beforeSort = p.substring(0, p.indexOf("Sort ["))
    assert(!beforeSort.contains("SinglePartition"),
      s"packing degenerated to a single-partition window:\n$p")
  }

  test("pagerank round broadcasts node-sized ranks — never shuffle-join edges") {
    // the per-round checkpoints erase round plans from the final query,
    // so pin the shape of ONE un-materialized round directly
    import spark.implicits._
    val e = Seq((1L, 2L, 1.0, 1.0), (2L, 1L, 1.0, 1.0))
      .toDF("src", "dst", "w", "wout")
    val nodes = Seq(1L, 2L).toDF("node")
    val rank = nodes.withColumn("rank", org.apache.spark.sql.functions.lit(1.0))
    val p = graft.operators.PageRank.rankRound(e, nodes, rank)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"rank join lost its broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
    // quantized contributions must partial-sum map-side before the one
    // aggregation shuffle per round
    assert(p.contains("partial_sum"),
      s"contribution sum lost map-side partials:\n$p")
  }

  test("q_budget_select boundary window partitions by score — no global sort window") {
    val p = plan("q_budget_select")
    assert(p.contains("Window"), s"no window in plan:\n$p")
    assert(p.contains("hashpartitioning(score"),
      s"boundary window is not score-partitioned:\n$p")
    // a global running sum would be a SinglePartition exchange feeding
    // the window; only the final presentation ORDER BY may come later
    val beforeWindow = p.substring(0, p.indexOf("Window"))
    assert(!beforeWindow.contains("SinglePartition"),
      s"budget selection degenerated to a single-partition window:\n$p")
  }

  test("q_text_embed is one aggregation over the token scan — no joins") {
    val p = plan("q_text_embed")
    assert(!p.contains("Join"), s"hashing-trick embed must not join:\n$p")
    assert(p.contains("partial"),
      s"signed-count pivot lost map-side partials:\n$p")
    assert(!p.contains("lang"),
      s"embed must not read unreferenced columns:\n$p")
  }

  test("q_lm_perplexity broadcasts the vocabulary-sized model tables") {
    val p = plan("q_lm_perplexity")
    assert(!p.contains("CartesianProduct"))
    // V is a one-row frame: its crossJoin must be a broadcast nested loop
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      s"LM model join lost its broadcast:\n$p")
  }

  test("q_quantile_sketch takes the bottom-k without a global sort") {
    val p = plan("q_quantile_sketch")
    assert(p.contains("TakeOrderedAndProject"),
      s"bottom-k degenerated to a full sort:\n$p")
  }

  test("q_stickiness expands day ranges without cartesian or range join") {
    val p = plan("q_stickiness")
    assert(!p.contains("CartesianProduct"), s"range-join degeneracy:\n$p")
    assert(p.contains("Generate"), s"no sequence explode in plan:\n$p")
  }

  test("q_inverted_index and q_top_paths aggregate with map-side partials") {
    for (q <- Seq("q_inverted_index", "q_top_paths"))
      assert("HashAggregate|ObjectHashAggregate|SortAggregate".r
        .findAllIn(plan(q)).size >= 2, s"$q: no partial+final agg pair")
  }

  test("q_rfm_segments windows partition by bucket — never the whole customer base") {
    val p = plan("q_rfm_segments")
    val windowLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.nonEmpty &&
      windowLines.forall(!_.contains("SinglePartition")),
      s"customer-base-wide window:\n${windowLines.mkString("\n")}")
  }

  test("q_anomaly_flags broadcasts the per-type robust stats") {
    val p = plan("q_anomaly_flags")
    assert(p.contains("BroadcastHashJoin"),
      s"median/MAD join lost its broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("round-7 wave 5/6 queries plan without cartesian products") {
    for (q <- Seq("q_markov", "q_session_stats", "q_hll_distinct",
        "q_skew_report", "q_profile", "q_pmi", "q_equidepth",
        "q_er_clusters", "q_fuzzy_decontam", "q_autocorr",
        "q_seasonality", "q_kmv_setops", "q_quantile_norm",
        "q_ngram_diversity", "q_funnel_latency", "q_seq_pairs",
        "q_user_entropy", "q_theilsen", "q_ab_test",
        "q_word_neighbors", "q_assoc_rules", "q_clustering_coef",
        "q_psi", "q_chi2", "q_mutual_info", "q_spearman",
        "q_containment", "q_trimmed_mean", "q_itemsets3",
        "q_graph_summary", "q_type_overlap", "q_daily_percentiles")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q degenerated:\n$p")
    }
  }

  test("q_markov and q_session_stats windows partition by user — never SinglePartition") {
    // q_markov's window sits behind a localCheckpoint (its count table
    // feeds two consumers), so probe the operator's REAL adjacency
    // stage, not a reconstruction
    val markovAdj = graft.operators.EventAnalytics
      .markovAdjacency(graft.Tables.t(spark, sfDir, "events"))
      .queryExecution.executedPlan.toString
    val probes = Seq("markov-adjacency" -> markovAdj,
      "q_session_stats" -> plan("q_session_stats"))
    for ((name, p) <- probes) {
      val windowLines = p.linesIterator.filter(_.contains("Window")).toSeq
      assert(windowLines.nonEmpty &&
        windowLines.forall(!_.contains("SinglePartition")),
        s"$name has a corpus-wide window:\n${windowLines.mkString("\n")}")
    }
  }

  test("q_equidepth and q_quantile_norm rank via bucket windows — no global sort window") {
    for (q <- Seq("q_equidepth", "q_quantile_norm")) {
      val windowLines = plan(q).linesIterator
        .filter(_.contains("Window")).toSeq
      assert(windowLines.nonEmpty &&
        windowLines.forall(!_.contains("SinglePartition")),
        s"$q has a SinglePartition window:\n${windowLines.mkString("\n")}")
    }
  }

  test("q_fuzzy_decontam broadcasts the benchmark band table") {
    val p = plan("q_fuzzy_decontam")
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark side lost its broadcast:\n$p")
    // the training side must never be the build side of a shuffle join
    assert(!p.contains("CartesianProduct"))
  }

  test("q_hll_distinct aggregates registers with map-side partials") {
    val p = plan("q_hll_distinct")
    assert(p.contains("partial_max") || p.contains("partial_"),
      s"register max lost its partial aggregation:\n$p")
  }

  test("round-11 rows: multimodal release joins equi, tertile windows never SinglePartition") {
    val pm = plan("q_multimodal_release")
    assert(!pm.contains("CartesianProduct") &&
      !pm.contains("BroadcastNestedLoop"),
      s"q_multimodal_release degenerated:\n$pm")
    // the two-phase tertile must have replaced the per-language ntile
    // sort: every window in the release/ccnet plans partitions by at
    // least (lang, bucket) or a rank bucket — a SinglePartition window
    // would be the corpus-sized sort the round removed
    // (q_corpus_release_inc serves a checkpointed manifest, so the
    // shared body is audited through these two)
    for (q <- Seq("q_ccnet_buckets", "q_corpus_release")) {
      val windowLines = plan(q).linesIterator
        .filter(_.contains("Window")).toSeq
      assert(windowLines.forall(!_.contains("SinglePartition")),
        s"$q has a corpus-wide window:\n${windowLines.mkString("\n")}")
    }
  }

  test("IVF-PQ serve paths join equi/broadcast — no cartesian, no nested loop") {
    // the rerank stage joins a tiny shortlist back to the stored
    // vectors, and the batch path joins per-query distance tables: all
    // of it must stay equi-join + broadcast (a cartesian here would
    // scan the corpus per query at scale)
    val p1 = plan("q_ivfpq_search")
    assert(!p1.contains("CartesianProduct") &&
      !p1.contains("BroadcastNestedLoop"), s"q_ivfpq_search degenerated:\n$p1")
    assert(p1.contains("BroadcastHashJoin"),
      s"q_ivfpq_search lost its broadcasts:\n$p1")
    // the batch query's public form serves out of a scratch store and
    // checkpoints (plan = one RDD scan) — audit the serving frame itself
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-planspec-")
    try {
      val store = new graft.store.ModelStore(spark, dir.toString)
      graft.llm.Similarity.saveIvfPqIndex(emb, store)
      val p2 = graft.llm.Similarity
        .ivfPqKnnJoin(store, emb.filter(org.apache.spark.sql.functions
          .col("vec_id") < 8))
        .queryExecution.executedPlan.toString
      assert(!p2.contains("CartesianProduct") &&
        !p2.contains("BroadcastNestedLoop"), s"q_ivfpq_batch degenerated:\n$p2")
      assert(p2.contains("BroadcastHashJoin"),
        s"q_ivfpq_batch lost its broadcasts:\n$p2")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
  }
  test("wave-15 rows: broadcast assignment, partitioned windows, no cartesian") {
    val pp = plan("q_proto_prune")
    assert(pp.contains("BroadcastHashJoin"),
      s"proto_prune assignment join is not broadcast:\n$pp")
    assert(pp.contains("hashpartitioning(cid"),
      s"proto_prune rank window is not cell-partitioned:\n$pp")
    assert(!pp.contains("CartesianProduct"), s"cartesian in proto_prune:\n$pp")

    val cb = plan("q_ccnet_buckets")
    assert(cb.contains("hashpartitioning(lang"),
      s"ccnet ntile window is not lang-partitioned:\n$cb")
    assert(!cb.contains("SinglePartition"),
      s"ccnet degenerated to a single-partition window:\n$cb")

    val sp = plan("q_shard_plan")
    assert(sp.contains("hashpartitioning(__b"),
      s"shard_plan rank is not bucket-partitioned:\n$sp")
    assert(!sp.contains("CartesianProduct"), s"cartesian in shard_plan:\n$sp")

    val sd = plan("q_soft_dedup")
    assert(sd.contains("partial_count") || sd.contains("partial count"),
      s"soft_dedup cluster sizes lack map-side partials:\n$sd")

    val iq = plan("q_int8_quant")
    assert(!iq.contains("Join"),
      s"int8 audit should be a pure scan + aggregation:\n$iq")
  }

  test("wave-16/17 rows: cell-bounded pair joins, two-phase cap, no cartesian") {
    // the in-cell audits pair via an equi-join on cid — never cartesian —
    // and rank inside per-query windows, never SinglePartition
    Seq("q_label_noise", "q_margin_pairs").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"cartesian in $q:\n$p")
      assert(p.contains("hashpartitioning(q_id"),
        s"$q window is not query-partitioned:\n$p")
    }
    // source cap: the boundary plan broadcasts; the only window is the
    // boundary bucket's, partitioned by source — no global sort of docs
    val sc = plan("q_source_cap")
    assert(sc.contains("BroadcastHashJoin"),
      s"source_cap plan table is not broadcast:\n$sc")
    assert(!sc.contains("CartesianProduct"), s"cartesian in source_cap:\n$sc")
    // content split is a pure projection — no join, no window, no shuffle
    // beyond the output sort
    val cs = plan("q_content_split")
    assert(!cs.contains("Join") && !cs.contains("Window"),
      s"content_split should be scan+project:\n$cs")
  }
}

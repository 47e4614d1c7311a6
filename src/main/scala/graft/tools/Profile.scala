package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for slow queries (dev tool; body rotates to
  * whatever is under investigation). Current body (round 9b): stage
  * split of `q_pipeline_e2e` — Bench's one number can't say whether
  * the ~10 s goes to the audit-JSON parse, the diff/messages
  * checkpoints, the dispatcher apply, or the final flatten/sort — plus
  * the cold-vs-warm split of the new shared-model cache
  * ([[graft.store.ModelStore.shared]]) at base and 10× scale. */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    // data layout overridable per checkout (ADVICE r7): base dir from
    // the same env var Bench reads, stress dir from its own override
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val stressDir = sys.env.getOrElse("SPARK_GRAFT_STRESS_DIR",
      "/root/repo/stress/sf1")

    // ---- q_pipeline_e2e stage split (two reps: first-touch codegen
    // of the dispatcher plans is a one-per-process cost; rep 2 is the
    // steady state a microbatch deployment pays per batch) ----
    import graft.jobs.Pipeline
    for (rep <- 1 to 2) {
      val raw = Pipeline.syntheticAuditEvents(spark, sfDir)
      time(s"e2e[$rep] raw events") { raw.count() }
      time(s"e2e[$rep] parse only") {
        Pipeline.parse(raw)._1.count()
      }
      time(s"e2e[$rep] versions") {
        Pipeline.toVersions(Pipeline.parse(raw)._1).count()
      }
      time(s"e2e[$rep] changes ckpt") {
        graft.Materialize.checkpoint(graft.diff.EntityDiff.determineChange(
          Pipeline.toVersions(Pipeline.parse(raw)._1))).count()
      }
      var prep: (Long, org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame) = null
      time(s"e2e[$rep] prepare") {
        val (_, messages, direct, _) = Pipeline.prepare(raw)
        prep = (messages.count(), messages, direct)
        prep._1
      }
      val (_, messages, direct) = prep
      val docs0 = Pipeline.emptyDocsFor(raw)
      time(s"e2e[$rep] applyChanges") {
        graft.jobs.SynchronizeSearch.applyChanges(docs0,
          graft.jobs.SynchronizeSearch.directOnly(messages)).count()
      }
      time(s"e2e[$rep] applyAll") {
        Pipeline.applyAll(docs0, messages, direct).count()
      }
      time(s"e2e[$rep] full query") {
        Pipeline.pipelineE2E(spark, sfDir).count()
      }
    }

    // ---- shared-model cache cold/warm (4th battery): first touch per
    // (corpus, dials) trains + persists, second serves store-only ----
    for (d <- Seq(sfDir -> "base", stressDir -> "10x")) {
      time(s"annRecall cold ${d._2}") {
        graft.llm.Similarity.annRecall(spark, d._1).count()
      }
      time(s"annRecall warm ${d._2}") {
        graft.llm.Similarity.annRecall(spark, d._1).count()
      }
      time(s"ivfpqBatch warm ${d._2}") {
        graft.llm.Similarity.ivfPqKnnJoinQuery(spark, d._1).count()
      }
      time(s"bpeEncode cold ${d._2}") {
        graft.llm.TextOps.bpeEncodeQuery(spark, d._1).count()
      }
      time(s"bpeEncode warm ${d._2}") {
        graft.llm.TextOps.bpeEncodeQuery(spark, d._1).count()
      }
      time(s"bpeCoverage warm ${d._2}") {
        graft.llm.TextOps.bpeCoverageQuery(spark, d._1).count()
      }
      time(s"lmPerplexity cold ${d._2}") {
        graft.llm.TextOps.lmPerplexity(spark, d._1).count()
      }
      time(s"lmPerplexity warm ${d._2}") {
        graft.llm.TextOps.lmPerplexity(spark, d._1).count()
      }
    }
    spark.stop()
  }
}

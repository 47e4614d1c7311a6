package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage profiler for the 4-job pipeline (dev tool). */
object ProfileE2E {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    import graft.Tables.t
    import graft.jobs.{Pipeline, SynchronizeSearch}
    val raw = time("synthesize raw") {
      graft.Materialize.checkpoint(Pipeline.syntheticAuditEvents(spark, dir))
    }
    val (parsedOk, _) = time("parse") { Pipeline.parse(raw) }
    val (valid, _) = time("contractDlq") {
      graft.streaming.StreamingJobs.contractDlq(parsedOk) }
    val versions = time("toVersions") { Pipeline.toVersions(valid) }
    time("versions count (parse only)") {
      graft.Materialize.checkpoint(versions).count() }
    val vck = graft.Materialize.checkpoint(versions)
    time("diff only over parsed+ck") {
      graft.Materialize.checkpoint(
        graft.diff.EntityDiff.determineChange(vck)).count() }
    val changes = time("determineChange+ck") {
      graft.Materialize.checkpoint(
        graft.diff.EntityDiff.determineChange(versions)) }
    val messages = time("shapeMessages+ck") {
      graft.Materialize.checkpoint(Pipeline.shapeMessages(changes)) }
    val docs0 = graft.docs.DocumentAlgebra.createDocs(
      versions.limit(0)
        .select(col("guid"), col("typeName"),
          lit("q").as("qualifiedName"), col("attributes"))
        .withColumn("name", lit(null).cast("string"))
        .withColumn("definition", lit(null).cast("string"))
        .withColumn("email", lit(null).cast("string")))
    val docs1 = time("applyChanges (lazy)") {
      SynchronizeSearch.applyChanges(docs0,
        SynchronizeSearch.directOnly(messages)) }
    time("applyChanges count") { docs1.count() }
    val direct = changes.filter(col("directChange"))
    val links = time("links (lazy+distinct)") { Pipeline.toAttributeFieldLinks(direct) }
    val roles = Pipeline.toGovernanceRoles(direct)
    time("links isEmpty probe") { links.isEmpty }
    time("roles isEmpty probe") { roles.isEmpty }
    time("full run()") {
      val (docs, _, _, _) = Pipeline.run(spark, raw, docs0)
      docs.count()
    }
    time("full pipelineE2E") { Pipeline.pipelineE2E(spark, dir).count() }
    // ann_pairs breakdown
    val emb = t(spark, dir, "embeddings")
    time("signBucketTable") {
      graft.llm.Similarity.signBucketTable(emb).count() }
    val e2 = time("buckets+join+ck") {
      graft.Materialize.checkpoint(
        graft.llm.Similarity.signBucketTable(emb).join(emb, "vec_id")) }
    time("pair join + cosine") {
      val a2 = e2.as("a"); val b2 = e2.as("b")
      a2.join(b2, col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id"), col("b.vec_id"),
          graft.llm.Similarity.cosine(col("a.embedding"), col("b.embedding")).as("c"))
        .filter(col("c") >= 0.3).count() }
    time("candidate count") {
      val a2 = e2.as("a"); val b2 = e2.as("b")
      println("pairs=" + a2.join(b2, col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id")).count()) }
    spark.stop()
  }
}

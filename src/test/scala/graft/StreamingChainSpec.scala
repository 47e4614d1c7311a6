package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingJobs

/** The full 4-job chain as ONE streaming deployment: raw audit JSON →
  * parse/DLQ → per-guid stateful version transitions → columnar diff →
  * change messages → document store via foreachBatch (SURVEY §0 diagram,
  * streaming form). This is the pipeline a user of the reference would run
  * instead of its four Flink processes. */
class StreamingChainSpec extends AnyFunSuite {
  import SparkTestSession._

  private def rawEvent(guid: String, op: String, t: Long, typeName: String,
      attrs: Map[String, String]): String = {
    val attrJson = attrs.map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
    s"""{"kafkaNotification":{"eventTime":$t,"operationType":"$op","guid":"$guid"},
       |"atlasEntity":{"guid":"$guid","typeName":"$typeName",
       |"attributes":{$attrJson},"relationshipAttributes":{},
       |"createTime":1,"updateTime":$t}}""".stripMargin.replaceAll("\n", "")
  }

  test("raw JSON stream drives the doc store through stateful diff") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-chain").toString
    val store = new graft.store.DocumentStore(spark, s"$dir/store")

    def emptyDocs = {
      val creates = Seq.empty[(String, String, String, String, Long,
          Map[String, String], String, Boolean, Boolean)]
        .toDF("guid", "typeName", "qualifiedName", "eventType", "seq",
          "attributes", "parentGuid", "parentRemoved", "directChange")
        .withColumn("name", lit(null).cast("string"))
        .withColumn("definition", lit(null).cast("string"))
        .withColumn("email", lit(null).cast("string"))
      graft.docs.DocumentAlgebra.createDocs(creates)
    }

    val input = MemoryStream[String]
    // job 1: parse + DLQ split
    val parsed = StreamingJobs.parseWithDlq(input.toDF(), "chain")
    val valid = StreamingJobs.validRows(parsed)
    // jobs 2+3: per-guid stateful transitions → typed change rows
    val transitions = StreamingJobs.versionTransitions(
      valid.select(
        col("atlasEntity.guid"),
        col("atlasEntity.updateTime"),
        col("kafkaNotification.operationType"),
        col("atlasEntity.typeName"),
        col("atlasEntity.attributes"))
        .as[(String, Long, String, String, Map[String, String])])
    // shape transitions into SynchronizeSearch's message contract
    val messages = transitions.toDF()
      .select(
        col("guid"), col("typeName"),
        col("guid").as("qualifiedName"),
        when(col("operationType") === "ENTITY_CREATE", "EntityCreated")
          .when(col("operationType") === "ENTITY_DELETE", "EntityDeleted")
          .otherwise("EntityAttributeAudit").as("eventType"),
        col("updateTime").as("seq"),
        // changed/new attribute values vs previous state
        map_filter(col("newAttributes"), (k, v) =>
          !(map_contains_key(col("oldAttributes"), k) &&
            element_at(col("oldAttributes"), k) <=> v)).as("attributes"),
        lit(null).cast("string").as("parentGuid"),
        lit(false).as("parentRemoved"),
        lit(true).as("directChange"))
    // job 4: document store sync
    val q = StreamingJobs.syncToDocumentStore(messages, store, emptyDocs,
      s"$dir/ckpt").start()
    try {
      input.addData(
        rawEvent("gD", "ENTITY_CREATE", 100L, "m4i_data_domain",
          Map("qualifiedName" -> "fin", "name" -> "Fin")),
        "garbage not json")
      q.processAllAvailable()
      val docs1 = store.read().get.collect()
      assert(docs1.length == 1 && docs1.head.getAs[String]("name") == "Fin")

      input.addData(rawEvent("gD", "ENTITY_UPDATE", 200L, "m4i_data_domain",
        Map("qualifiedName" -> "fin", "name" -> "Fin2")))
      q.processAllAvailable()
      val docs2 = store.read().get.collect()
      assert(docs2.length == 1 && docs2.head.getAs[String]("name") == "Fin2")

      // late replay of an older version: state drops it, store unchanged
      input.addData(rawEvent("gD", "ENTITY_UPDATE", 150L, "m4i_data_domain",
        Map("qualifiedName" -> "fin", "name" -> "Stale")))
      q.processAllAvailable()
      assert(store.read().get.collect().head
        .getAs[String]("name") == "Fin2")
    } finally q.stop()
  }
}

package graft.model

import org.apache.spark.sql.types._

/** Core data model (SURVEY §1, FIXTURES §1–§6): the fixed envelopes of the
  * reference's streams as Scala case classes + explicit StructTypes.
  *
  * Design (SURVEY §7.3): entity `attributes` is an open map represented as
  * `Map[String,String]` with values canonicalized to JSON text (sorted keys)
  * so equality is string equality and the diff algebra stays pure columnar.
  * `relationshipAttributes` keeps structure: `Map[String, Seq[RelRef]]`.
  *
  * Reference shapes: entity fixture
  * `/root/reference/m4i_flink_tasks/synchronize_app_search/test__synchronize_app_search.py:112-204`;
  * message dataclass `/root/reference/m4i_flink_tasks/AtlasEntityChangeMessage.py:12-30`;
  * dead letter `/root/reference/m4i_flink_tasks/DeadLetterBoxMessage.py:12-18`.
  */
object AtlasModel {

  /** Relationship end-struct (FIXTURES §2 relationshipAttributes values). */
  case class RelRef(
      guid: String,
      typeName: String,
      entityStatus: String = "ACTIVE",
      displayText: String = null,
      relationshipType: String = null,
      relationshipGuid: String = null,
      relationshipStatus: String = "ACTIVE")

  /** Atlas entity with canonical-JSON attribute values (FIXTURES §2). */
  case class AtlasEntity(
      guid: String,
      typeName: String,
      attributes: Map[String, String],
      relationshipAttributes: Map[String, Seq[RelRef]],
      createTime: Long,
      updateTime: Long,
      createdBy: String = null,
      updatedBy: String = null,
      status: String = "ACTIVE",
      version: Long = 0L,
      isIncomplete: Boolean = false,
      classifications: Seq[String] = Seq.empty,
      labels: Seq[String] = Seq.empty)

  /** Kafka audit envelope (FIXTURES §1, `AtlasChangeMessage`). */
  case class ChangeEnvelope(
      eventTime: Long,
      operationType: String, // ENTITY_CREATE | ENTITY_UPDATE | ENTITY_DELETE
      guid: String)

  /** Job-1 output (FIXTURES §3): envelope + enriched entity. */
  case class EnrichedEvent(
      kafkaNotification: ChangeEnvelope,
      atlasEntity: AtlasEntity)

  /** Job-3 output (FIXTURES §4, `EntityMessage`). */
  case class EntityMessage(
      typeName: String,
      qualifiedName: String,
      guid: String,
      originalEventType: String,
      directChange: Boolean,
      eventType: String, // EntityCreated | EntityDeleted | EntityAttributeAudit | EntityRelationshipAudit
      insertedAttributes: Seq[String],
      changedAttributes: Seq[String],
      deletedAttributes: Seq[String],
      insertedRelationships: Map[String, Seq[RelRef]],
      changedRelationships: Map[String, Seq[RelRef]],
      deletedRelationships: Map[String, Seq[RelRef]],
      oldValue: AtlasEntity,
      newValue: AtlasEntity)

  object EventTypes {
    val EntityCreated = "EntityCreated"
    val EntityDeleted = "EntityDeleted"
    val EntityAttributeAudit = "EntityAttributeAudit"
    val EntityRelationshipAudit = "EntityRelationshipAudit"
  }

  /** Dead-letter message (FIXTURES §6; S10 error channel). */
  case class DeadLetter(
      timestamp: Double,
      originalNotification: String,
      job: String,
      description: String)

  /** App Search document (FIXTURES §5, `create_doc`
    * `synchronize_app_search.py:565-592`). Derived fields are modeled as two
    * parallel maps (name → display value / guid) instead of 20 hardcoded
    * columns — the reference's per-type dispatch table becomes data
    * (SURVEY G18 note). */
  case class SearchDocument(
      id: String,
      guid: String,
      qualifiedName: String,
      typeName: String,
      sourceType: String, // Business | Technical
      m4iSourceTypes: Seq[String],
      superTypeNames: Seq[String],
      name: String,
      definition: String,
      email: String,
      parentGuid: String,
      breadcrumbGuid: Seq[String],
      breadcrumbName: Seq[String],
      breadcrumbType: Seq[String],
      derivedNames: Map[String, String], // e.g. "deriveddatadomain" -> "Finance"
      derivedGuids: Map[String, String], // e.g. "deriveddatadomainguid" -> guid
      dqScores: Map[String, Double])

  /** Versioned entity store row (FIXTURES §7): entity + version key. */
  case class VersionedEntity(
      guid: String,
      updateTime: Long,
      docId: String, // "{guid}_{updateTime}" (publish_state_job.py:77)
      entity: AtlasEntity)

  // --- explicit StructTypes for from_json/to_json over raw Kafka strings ---

  val relRefSchema: StructType = StructType(Seq(
    StructField("guid", StringType),
    StructField("typeName", StringType),
    StructField("entityStatus", StringType),
    StructField("displayText", StringType),
    StructField("relationshipType", StringType),
    StructField("relationshipGuid", StringType),
    StructField("relationshipStatus", StringType)))

  val entitySchema: StructType = StructType(Seq(
    StructField("guid", StringType),
    StructField("typeName", StringType),
    StructField("attributes", MapType(StringType, StringType)),
    StructField("relationshipAttributes",
      MapType(StringType, ArrayType(relRefSchema))),
    StructField("createTime", LongType),
    StructField("updateTime", LongType),
    StructField("createdBy", StringType),
    StructField("updatedBy", StringType),
    StructField("status", StringType),
    StructField("version", LongType),
    StructField("isIncomplete", BooleanType),
    StructField("classifications", ArrayType(StringType)),
    StructField("labels", ArrayType(StringType))))

  val envelopeSchema: StructType = StructType(Seq(
    StructField("eventTime", LongType),
    StructField("operationType", StringType),
    StructField("guid", StringType)))

  val enrichedSchema: StructType = StructType(Seq(
    StructField("kafkaNotification", envelopeSchema),
    StructField("atlasEntity", entitySchema)))
}

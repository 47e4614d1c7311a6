package graft.diff

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.DiffOps

/** Job-3 re-expression: determine_change as pure columnar diff
  * (SURVEY §3.2, §2.4 A1–A7; reference
  * `/root/reference/scripts/determine_change_job.py:230-425`).
  *
  * The reference processes one record at a time: fetch previous version from
  * Elasticsearch (1 HTTP round-trip per UPDATE), build single-row pandas
  * frames, compare cell-wise. Here the whole stream of entity versions is a
  * DataFrame; the previous version arrives via `lag` over
  * (partition by guid, order by updateTime) — one shuffle, zero external
  * calls — and the six change sets are map/array expressions (codegen'd).
  *
  * Input contract: columns guid, updateTime, operationType, typeName,
  * attributes (MAP<STRING,STRING>, canonical-JSON values),
  * relationshipAttributes (MAP<STRING,ARRAY<STRUCT>>).
  *
  * Bug-for-intent notes (SURVEY §2.8): the reference's `or`-vs-`and`
  * predicate bug in get_added/changed/deleted_fields and its
  * `relationsghipAttributes` typo are corrected here — we implement the
  * evident intent, as the oracle does.
  */
object EntityDiff {

  private val emptyAttrs = map().cast("map<string,string>")

  /** Columns that participate in the equal-updateTime content tiebreak.
    * relationshipAttributes is included: two same-guid versions differing
    * ONLY in relationships must still order deterministically, or
    * inserted/deleted relationship diffs flip across replays. Must stay in
    * sync with VersionedStore.contentTie. */
  val tieCols: Seq[String] =
    Seq("operationType", "typeName", "attributes", "relationshipAttributes")

  /** Attach the previous version per guid (J3 as-of). Ties on updateTime
    * (two versions in one batch with the same timestamp) order by a
    * deterministic content hash so replays produce identical diffs —
    * effectively-once depends on the whole chain being deterministic. */
  def withPrevious(versions: DataFrame): DataFrame = {
    val tie = md5(to_json(struct(tieCols.map(col): _*)))
    val w = Window.partitionBy("guid").orderBy(col("updateTime"), tie)
    versions
      .withColumn("old_attributes", lag(col("attributes"), 1).over(w))
      .withColumn("old_relationships", lag(col("relationshipAttributes"), 1).over(w))
  }

  /** Null/empty scrubbing (P8/P9 `delete_*_values_from_dict`
    * determine_change_job.py:53-65): drop null values and JSON-array values
    * (relationships travel separately). Canonical-JSON makes "is array" a
    * prefix test. Native kernel ([[graft.functions.MapScrub]]) — the
    * map_filter lambda interpreted per entry on the diff hot path. */
  def scrubbedAttrs(m: Column): Column =
    graft.functions.MapScrub.map_scrub(coalesce(m, emptyAttrs))

  /** Interpreted reference form (differential tests). */
  def scrubbedAttrsHof(m: Column): Column =
    map_filter(coalesce(m, emptyAttrs),
      (_, v) => v.isNotNull && !v.startsWith("["))

  /** The six change sets + gate, as select-able columns. */
  def changeColumns(newAttrs: Column, oldAttrs: Column,
      newRel: Column, oldRel: Column): Seq[Column] = {
    val n = scrubbedAttrs(newAttrs)
    val o = scrubbedAttrs(oldAttrs)
    Seq(
      DiffOps.addedKeys(n, o).as("insertedAttributes"),
      DiffOps.changedKeys(n, o).as("changedAttributes"),
      DiffOps.deletedKeys(n, o).as("deletedAttributes"),
      DiffOps.relationshipDiff(newRel, oldRel).as("insertedRelationships"),
      DiffOps.relationshipDiff(oldRel, newRel).as("deletedRelationships"))
  }

  /** Full determine_change over a versioned entity DataFrame → one change
    * message per version transition (CREATE/UPDATE/DELETE branching per
    * determine_change_job.py:254-311; A7 gate per :340-342).
    *
    * `base`: optional prior state (latest stored version per guid,
    * `VersionedStore.latest`) seeded into the as-of window so cross-batch
    * diffs see what the previous batch wrote — the batch analogue of the
    * streaming job's GroupState. Seed rows are not re-emitted. */
  def determineChange(versions: DataFrame,
      base: Option[DataFrame] = None): DataFrame = {
    // P5 feed: directChange rides along when the caller derived it from the
    // audit envelope (Pipeline.toVersions); default true (reference
    // is_direct_change returns True when no audit is found).
    def withDc(df: DataFrame): DataFrame =
      if (df.columns.contains("directChange")) df
      else df.withColumn("directChange", lit(true))
    val cols = Seq("guid", "updateTime", "operationType", "typeName",
      "attributes", "relationshipAttributes", "directChange")
    val seeded = base match {
      case None => withDc(versions).withColumn("_seed", lit(false))
      case Some(b) =>
        withDc(versions).select(cols.map(col): _*)
          .withColumn("_seed", lit(false))
          .unionByName(withDc(b).select(cols.map(col): _*)
            .withColumn("_seed", lit(true)))
    }
    determineChangeImpl(seeded).filter(!col("_seed")).drop("_seed")
  }

  private def determineChangeImpl(versions: DataFrame): DataFrame = {
    val emptyRel = map()
      .cast("map<string,array<struct<guid:string,typeName:string,entityStatus:string,displayText:string,relationshipType:string,relationshipGuid:string,relationshipStatus:string>>>")
    val withPrev = withPrevious(versions)
      .withColumn("old_attributes",
        when(col("operationType") === "ENTITY_CREATE", emptyAttrs)
          .otherwise(coalesce(col("old_attributes"), emptyAttrs)))
      .withColumn("old_relationships",
        when(col("operationType") === "ENTITY_CREATE", emptyRel)
          .otherwise(coalesce(col("old_relationships"), emptyRel)))
      // DELETE: diff against empty new side (everything deleted)
      .withColumn("new_attributes",
        when(col("operationType") === "ENTITY_DELETE", emptyAttrs)
          .otherwise(col("attributes")))
      .withColumn("new_relationships",
        when(col("operationType") === "ENTITY_DELETE", emptyRel)
          .otherwise(col("relationshipAttributes")))

    val diffed = withPrev.select(
      (Seq(col("_seed"), col("guid"), col("updateTime"), col("typeName"),
        col("operationType"), col("directChange"),
        element_at(col("attributes"), "qualifiedName").as("qualifiedName"),
        col("new_attributes").as("newAttributes")) ++
        changeColumns(col("new_attributes"), col("old_attributes"),
          col("new_relationships"), col("old_relationships"))): _*)

    // The reference emits one message PER AUDIT CATEGORY: an update that
    // changes both attributes and relationships produces an attribute-audit
    // row AND a relationship-audit row (determine_change_job.py:346-397) —
    // otherwise the dispatcher's attribute phase would silently skip the
    // attribute half of mixed updates. The explode over present categories
    // also implements the A7 no-op gate (no category → no row).
    val hasAttr = size(col("insertedAttributes")) +
      size(col("changedAttributes")) + size(col("deletedAttributes")) > 0
    val hasRel = size(map_keys(col("insertedRelationships"))) +
      size(map_keys(col("deletedRelationships"))) > 0
    val cats =
      when(col("operationType") === "ENTITY_CREATE", array(lit("created")))
        .when(col("operationType") === "ENTITY_DELETE", array(lit("deleted")))
        .otherwise(filter(
          array(when(hasAttr, lit("attr")), when(hasRel, lit("rel"))),
          c => c.isNotNull))
    val emptyKeys = array().cast("array<string>")
    diffed
      .withColumn("_cat", explode(cats))
      .withColumn("eventType",
        when(col("_cat") === "created", "EntityCreated")
          .when(col("_cat") === "deleted", "EntityDeleted")
          .when(col("_cat") === "rel", "EntityRelationshipAudit")
          .otherwise("EntityAttributeAudit"))
      .withColumn("insertedAttributes",
        when(col("_cat") === "rel", emptyKeys).otherwise(col("insertedAttributes")))
      .withColumn("changedAttributes",
        when(col("_cat") === "rel", emptyKeys).otherwise(col("changedAttributes")))
      .withColumn("deletedAttributes",
        when(col("_cat") === "rel", emptyKeys).otherwise(col("deletedAttributes")))
      .withColumn("insertedRelationships",
        when(col("_cat") === "attr", emptyRel).otherwise(col("insertedRelationships")))
      .withColumn("deletedRelationships",
        when(col("_cat") === "attr", emptyRel).otherwise(col("deletedRelationships")))
      .drop("_cat")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Map-diff algebra (SURVEY §2.4 A1–A7): the heart of the reference's
  * determine_change job (`/root/reference/scripts/determine_change_job.py:110-191`),
  * re-expressed as pure columnar map/array functions so whole-stage codegen
  * applies — no per-record pandas frames, no external as-of lookups.
  *
  * These helpers operate on `MapType(String,String)` columns (the engine's
  * representation of the reference's open attribute dicts, SURVEY §7.3).
  */
object DiffOps {

  /** A2: keys present in `newM` but absent from `oldM` (sorted for stable
    * comparison). The reference's get_added_fields intent
    * (`determine_change_job.py:177-183` — its `or` bug corrected per §2.8).
    * Native codegen kernel ([[graft.functions.MapKeyDiff]]) — one static
    * call per row instead of an interpreted lambda per key; the HOF forms
    * below stay as the differential-testing reference (MapDiffSpec pins
    * equality). */
  def addedKeys(newM: Column, oldM: Column): Column =
    graft.functions.MapKeyDiff.added_keys(newM, oldM)

  /** A4: keys removed between versions. */
  def deletedKeys(newM: Column, oldM: Column): Column =
    graft.functions.MapKeyDiff.deleted_keys(newM, oldM)

  /** A3: keys present in both with differing values. */
  def changedKeys(newM: Column, oldM: Column): Column =
    graft.functions.MapKeyDiff.changed_keys(newM, oldM)

  /** Interpreted HOF references for the three diffs (differential tests). */
  def addedKeysHof(newM: Column, oldM: Column): Column =
    array_sort(filter(map_keys(newM), k => !map_contains_key(oldM, k)))
  def deletedKeysHof(newM: Column, oldM: Column): Column =
    array_sort(filter(map_keys(oldM), k => !map_contains_key(newM, k)))
  def changedKeysHof(newM: Column, oldM: Column): Column =
    array_sort(filter(map_keys(newM),
      k => map_contains_key(oldM, k) && !(element_at(oldM, k) <=> element_at(newM, k))))

  /** A1: all non-matching keys = added ∪ deleted ∪ changed. */
  def nonMatchingKeys(newM: Column, oldM: Column): Column =
    array_sort(concat(addedKeys(newM, oldM), deletedKeys(newM, oldM),
      changedKeys(newM, oldM)))

  /** A5/A6: per-key array diff for relationship maps
    * (`MapType(String, ArrayType(T))`): elements of newRel[k] not in oldRel[k]
    * (array_except semantics: distinct, left order), dropping now-empty keys
    * — `determine_change_job.py:127-167`. Native kernel
    * ([[graft.functions.RelationshipDiff]]); the HOF form below is the
    * differential reference. */
  def relationshipDiff(newRel: Column, oldRel: Column): Column =
    graft.functions.RelationshipDiff.relationship_diff(newRel, oldRel)

  /** Interpreted map_zip_with + array_except reference (differential tests). */
  def relationshipDiffHof(newRel: Column, oldRel: Column): Column =
    map_filter(
      map_zip_with(newRel, oldRel, (_, n, o) =>
        array_except(coalesce(n, array()), coalesce(o, array()))),
      (_, v) => size(v) > 0)

  /** Q-diff over the events table: synthesize versioned attribute maps from
    * consecutive events per user (the events table stands in for entity
    * versions, FIXTURES §8), then run A1–A4. One shuffle on user_id.
    *
    * Map shape: k (json-extracted), etype always present; flag only on
    * purchases — so added/deleted genuinely vary. */
  def diffKeysRaw(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val newMap = map_concat(
      map(lit("k"), get_json_object(col("props"), "$.k"),
        lit("etype"), col("event_type")),
      when(col("event_type") === "purchase", map(lit("flag"), lit("1")))
        .otherwise(map().cast("map<string,string>")))
    val empty = map().cast("map<string,string>")
    t(spark, dir, "events")
      .withColumn("new_map", newMap)
      .withColumn("old_map", lag(col("new_map"), 1).over(w))
      .select(
        col("event_id"), col("user_id"),
        addedKeys(col("new_map"), coalesce(col("old_map"), empty)).as("added"),
        deletedKeys(col("new_map"), coalesce(col("old_map"), empty)).as("deleted"),
        changedKeys(col("new_map"), coalesce(col("old_map"), empty)).as("changed"))
      .orderBy("user_id", "event_id")
  }

  /** Oracle surface for the diff: array columns serialized to '|'-joined
    * strings so both engines hash identical scalars (q_simhash precedent). */
  def diffKeys(spark: SparkSession, dir: String): DataFrame =
    diffKeysRaw(spark, dir).select(
      col("event_id"), col("user_id"),
      array_join(col("added"), "|").as("added"),
      array_join(col("deleted"), "|").as("deleted"),
      array_join(col("changed"), "|").as("changed"))

  /** A7 change-count gate composed with the diff: only rows where something
    * changed (drop all-empty diffs), counted per user. */
  def changeGate(spark: SparkSession, dir: String): DataFrame =
    diffKeysRaw(spark, dir)
      .filter(size(col("added")) + size(col("deleted")) + size(col("changed")) > 0)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_changes"))
      .orderBy("user_id")
}

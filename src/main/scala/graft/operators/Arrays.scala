package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Explode + array-membership surface (SURVEY §2.6 families 6 and 8): the
  * breadcrumb-array algebra of job 4 (G9/G10 `synchronize_app_search.py:231-260`,
  * J4 `:101-115`) exercised over word arrays from `documents`.
  */
object Arrays {

  /** §2.7 explode (reference `GetResult` FlatMapFunction,
    * `determine_change_job.py:429-433`): word frequency via explode+groupBy.
    * At scale: explode is pipelined (no shuffle); the groupBy shuffles with
    * map-side partial counts. */
  def explodeWords(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(explode(split(trim(col("text")), "\\s+")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("n"))
      .orderBy("word")

  /** J4/G9/G10 array ops: contains / position / slice / transform /
    * intersect / except over per-document word arrays. Array outputs are
    * '|'-joined for the oracle hash (the algebra itself stays array-typed
    * until the final projection). */
  def arrayOps(spark: SparkSession, dir: String): DataFrame = {
    val words = split(trim(col("text")), "\\s+")
    t(spark, dir, "documents")
      .withColumn("words", words)
      .select(
        col("doc_id"),
        size(col("words")).as("n_words"),
        array_join(slice(col("words"), 1, 3), "|").as("first3"),
        array_contains(col("words"), "scan").as("has_scan"),
        array_position(col("words"), "scan").as("scan_pos"),
        array_join(transform(slice(col("words"), 1, 3), w => upper(w)), "|")
          .as("upper3"),
        array_join(array_sort(slice(col("words"), 1, 5)), "|").as("sorted5"),
        array_join(array_sort(array_intersect(slice(col("words"), 1, 3),
          slice(col("words"), 4, 3))), "|").as("inter33"),
        array_join(array_sort(array_except(slice(col("words"), 1, 3),
          slice(col("words"), 4, 3))), "|").as("except33"))
      .orderBy("doc_id")
  }

  /** collect_set aggregation into sorted arrays (last-mile of G17/G18's
    * set-valued derived fields), '|'-joined for the oracle hash. */
  def arrayAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy("lang")
      .agg(array_join(array_sort(collect_set(col("source"))), "|").as("sources"),
        count(lit(1)).as("n_docs"))
      .orderBy("lang")
}

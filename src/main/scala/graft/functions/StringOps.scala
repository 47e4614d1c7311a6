package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Small string/row-transform helpers mirroring reference operators
  * (SURVEY §2.2 P11–P13). */
object StringOps {

  /** P11: strip any of the given prefixes (first match wins) —
    * `remove_prefix` over a set, `determine_change_job.py:96-108`. */
  def stripPrefixes(c: Column, prefixes: Seq[String]): Column =
    prefixes.foldLeft(c)((acc, p) =>
      when(acc.startsWith(p),
        acc.substr(lit(p.length + 1), length(acc) - p.length))
        .otherwise(acc))

  /** P7: drop all columns starting with any prefix (`drop_columns`
    * `determine_change_job.py:41-51` — its relationsghip typo corrected). */
  def dropByPrefix(df: org.apache.spark.sql.DataFrame,
      prefixes: Seq[String]): org.apache.spark.sql.DataFrame =
    df.drop(df.columns.filter(c => prefixes.exists(c.startsWith)): _*)

  /** P12: extract the first JSON object embedded in free text
    * (`re.search(r"{.*}", …)` `determine_change_job.py:90`). */
  def extractJsonObject(c: Column): Column =
    nullif(regexp_extract(c, "(\\{.*\\})", 1), lit(""))

  /** P13: versioned doc id "{guid}_{updateTime}"
    * (`publish_state_job.py:77`). */
  def docId(guid: Column, updateTime: Column): Column =
    concat_ws("_", guid, updateTime)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Small string/row-transform helpers mirroring reference operators
  * (SURVEY §2.2 P11–P13). */
object StringOps {

  /** P11: strip any of the given prefixes (first match wins, at most ONE
    * strip — the reference's `remove_prefix` over a set,
    * `determine_change_job.py:96-108`). A single CASE over the ORIGINAL
    * value: folding strips over the previous result would re-test (and
    * re-strip) the already-stripped residue. */
  def stripPrefixes(c: Column, prefixes: Seq[String]): Column =
    prefixes.foldLeft(when(lit(false), c)) { (acc, p) =>
      acc.when(c.startsWith(p),
        c.substr(lit(p.length + 1), length(c) - p.length))
    }.otherwise(c)

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

package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Passage chunking — overlapping token windows per document, the
  * preprocessing step both retrieval indexes (RAG passage stores) and
  * long-context training pipelines run over a corpus: window W tokens,
  * stride S < W, so consecutive chunks share W−S tokens of context and
  * no boundary sentence is lost to a hard cut.
  *
  * Chunk rule (deterministic, both engines): starts at 0, S, 2S, …
  * while start < n_tokens; chunk = tokens[start, start+W); trailing
  * chunks shrink (the final one covers the tail). Empty documents emit
  * zero chunks. chunk_id = doc_id · 2^20 + ord — globally unique while
  * docs stay under 2^20 chunks (a 1 M-token doc at S = 16; enforced).
  *
  * Scale: one projection pass — split, explode the start sequence
  * (n/S ≈ ×4 row blow-up at the defaults, bounded by corpus token
  * count), slice the in-row token array. No shuffle at all until a
  * consumer aggregates; no corpus-wide state. At 100 TB this is the
  * map stage in front of the embedding/packing jobs.
  */
object Chunking {

  def passageChunksOf(docs: DataFrame, window: Int = 32,
      stride: Int = 16): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"passageChunks: need 0 < stride <= window, got W=$window S=$stride")
    docs
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0), size(col("toks")) - 1,
          lit(stride))).as(Seq("ord", "start")))
      .select(col("doc_id"),
        // uniqueness guard: ord ≥ 2^20 would collide with the next
        // doc_id's chunk 0 — fail LOUD instead of silently duplicating
        // ids in a retrieval store keyed on them
        (col("doc_id") * lit(1L << 20) +
          when(col("ord") < lit(1L << 20), col("ord"))
            .otherwise(raise_error(concat(lit("passageChunks: doc "),
              col("doc_id").cast("string"),
              lit(s" exceeds 2^20 chunks at stride $stride — " +
                "chunk_id space exhausted; raise the stride or widen " +
                "the id encoding"))))).as("chunk_id"),
        col("ord"), col("start"),
        slice(col("toks"), col("start") + 1, lit(window)).as("ctoks"))
      .select(col("doc_id"), col("chunk_id"), col("ord"), col("start"),
        size(col("ctoks")).as("n_tok"),
        array_join(col("ctoks"), " ").as("chunk_text"))
      .orderBy("doc_id", "ord")
  }

  def passageChunks(spark: SparkSession, dir: String): DataFrame =
    passageChunksOf(t(spark, dir, "documents"))
}

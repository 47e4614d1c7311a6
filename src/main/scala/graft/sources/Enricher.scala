package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** J1/S13: entity enrichment. The reference fetches each entity from the
  * Atlas REST API inside the map operator, one HTTP round-trip per record
  * plus a Keycloak token call (`/root/reference/scripts/get_entity_job.py:37-43`).
  *
  * The engine's default is the JOIN form: enrich against an entity snapshot
  * table (broadcast when it fits, shuffled otherwise) — zero external calls
  * on the hot path. The live form exists behind the same trait for parity
  * when the side must be fresh: mapPartitions with one pooled client per
  * partition and bounded batching, never per-record connection setup (P1
  * rich-map lifecycle).
  */
trait Enricher {
  /** Attach entity payloads for `guid` values in `events`. */
  def enrich(events: DataFrame): DataFrame
}

/** Join-based enrichment against a snapshot table keyed by guid. */
class SnapshotEnricher(snapshot: DataFrame, broadcastDim: Boolean = true)
    extends Enricher {
  override def enrich(events: DataFrame): DataFrame = {
    val dim = snapshot.withColumnRenamed("guid", "e_guid")
    val side = if (broadcastDim) broadcast(dim) else dim
    events.join(side, events("guid") === side("e_guid"), "left_outer")
      .drop("e_guid")
  }
}

/** Live-API enrichment shape: per-partition pooled client, batched gets.
  * The transport is injected (this container has no Atlas); production
  * would pass an HTTP client factory. */
class LiveEnricher(fetch: Seq[String] => Map[String, String],
    batchSize: Int = 64) extends Enricher with Serializable {
  override def enrich(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val (f, bs) = (fetch, batchSize) // avoid capturing `this` in the closure
    // dedupe before fetching: duplicate guids (multiple events per entity
    // per batch) would both multiply API calls AND fan out the join below
    val guids = events.select("guid").distinct().as[String]
    val fetched = guids.mapPartitions { it =>
      // one "client" per partition; request in bounded batches (the
      // reference opens connections per record — see SURVEY §3.1.4)
      it.grouped(bs).flatMap { batch =>
        val res = f(batch)
        batch.map(g => (g, res.get(g).orNull))
      }
    }.toDF("e_guid", "entityJson")
    events.join(fetched, events("guid") === fetched("e_guid"), "left_outer")
      .drop("e_guid")
  }
}

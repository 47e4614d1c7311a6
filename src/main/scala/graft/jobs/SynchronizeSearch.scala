package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.docs.DocumentAlgebra._

/** Job-4 pipeline: apply a batch of change messages to the document store
  * (SURVEY §3.3, G22 dispatcher `synchronize_elastic_job.py:80-113`).
  *
  * Message contract (flattened EntityMessage): guid, typeName, qualifiedName,
  * eventType, seq (intra-batch order), name, definition, email,
  * attributes MAP<STRING,STRING> (changed attrs), parentGuid (nullable —
  * present when a parent-child relationship was inserted), parentRemoved
  * (boolean — a parent-child relationship was deleted).
  *
  * Phase order inside a batch (SURVEY §7.5.1 — replaces the reference's
  * global parallelism=1 with per-batch phases):
  *   1. deletes (G20)            — anti-join
  *   2. creates (G19)            — union of fresh docs
  *   3. attribute upserts (G21)  — equi-join merge
  *   4. re-parenting (G8/G11)    — breadcrumb derive via parent join
  *   5. cascades (G9/G12/G17/G18)— ONE array_contains join over all changed
  *                                 parents (full ancestor paths make a single
  *                                 pass reach grandchildren)
  * Each phase is set-oriented over ALL messages of that kind at once.
  */
object SynchronizeSearch {

  /** P5: direct-change gate (`synchronize_elastic_job.py:74-76`). */
  def directOnly(messages: DataFrame): DataFrame =
    messages.filter(col("directChange"))

  def applyChanges(docs: DataFrame, messages: DataFrame): DataFrame = {
    val dedupedMsgs = lastWins(messages.withColumn("seq",
      coalesce(col("seq"), lit(0L))))

    // 1. deletes
    val deletes = dedupedMsgs.filter(col("eventType") === "EntityDeleted")
    val afterDelete = deleteDocs(docs, deletes)

    // 2. creates
    val creates = dedupedMsgs.filter(col("eventType") === "EntityCreated")
      .withColumn("name", element_at(col("attributes"), "name"))
      .withColumn("definition", element_at(col("attributes"), "definition"))
      .withColumn("email", element_at(col("attributes"), "email"))
    val withCreated = afterDelete.unionByName(createDocs(creates))

    // 3. attribute upserts (G21) over updated entities
    val attrUpdates = dedupedMsgs
      .filter(col("eventType") === "EntityAttributeAudit")
    val afterAttrs = applyAttributeUpdates(withCreated, attrUpdates)

    // 4. re-parenting: new parent edges re-derive child breadcrumbs (G8);
    //    removed edges reset them (G11)
    val newEdges = dedupedMsgs.filter(col("parentGuid").isNotNull)
      .select(col("guid").as("childGuid"), col("parentGuid"))
    val removedChildren = dedupedMsgs.filter(col("parentRemoved") === true)
      .select(col("guid"))
    val rederived = deriveBreadcrumbs(afterAttrs, newEdges)
    val reset = resetBreadcrumb(
      afterAttrs.join(removedChildren, Seq("guid"), "left_semi"))
    val touched = rederived.select("guid")
      .unionByName(reset.select("guid")).distinct()
    val afterEdges = afterAttrs
      .join(touched, Seq("guid"), "left_anti")
      .unionByName(rederived)
      .unionByName(reset)

    // 5. cascades: rename propagation into descendants' breadcrumbs and
    //    derived fields, one pass over all renamed docs (G17/G18)
    val renames = attrUpdates
      .filter(map_contains_key(col("attributes"), "name"))
      .select(col("guid"), element_at(col("attributes"), "name").as("newName"))
    if (renames.isEmpty) afterEdges
    else {
      val renamedDescendants = renameInBreadcrumbs(afterEdges, renames)
      val untouchedBc = afterEdges.join(renamedDescendants.select("guid"),
        Seq("guid"), "left_anti")
      renameInDerived(untouchedBc.unionByName(renamedDescendants), renames)
    }
  }
}

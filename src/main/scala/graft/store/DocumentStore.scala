package graft.store

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Mutable document store over immutable parquet versions (the engine-owned
  * replacement for the reference's App Search engine; SURVEY §3.3).
  *
  * Each update writes a NEW version directory and then atomically flips a
  * `_CURRENT` pointer — readers never see partial writes, and a crashed
  * writer leaves the previous version intact (the microbatch retries
  * idempotently). On a real deployment this is exactly the shape a
  * table-format (Iceberg/Delta) MERGE gives; here it is expressed with
  * primitive parquet + pointer so the engine stays dependency-free.
  */
class DocumentStore(spark: SparkSession, path: String) {
  private val root = Paths.get(path)
  Files.createDirectories(root)
  private def pointer = root.resolve("_CURRENT")

  def currentVersion: Option[Long] =
    if (Files.exists(pointer)) Some(Files.readString(pointer).trim.toLong)
    else None

  /** Current documents (empty schema-less read is the caller's bootstrap). */
  def read(): Option[DataFrame] =
    currentVersion.map(v => spark.read.parquet(root.resolve(s"v$v").toString))

  def readOrElse(bootstrap: => DataFrame): DataFrame =
    read().getOrElse(bootstrap)

  /** Write the next version and flip the pointer atomically. */
  def write(docs: DataFrame): Long = {
    val next = currentVersion.getOrElse(-1L) + 1
    docs.write.mode(SaveMode.Overwrite).parquet(root.resolve(s"v$next").toString)
    val tmp = root.resolve("_CURRENT.tmp")
    Files.writeString(tmp, next.toString)
    Files.move(tmp, pointer, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    next
  }
}

package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingRelease

/** Monitor-store fold contract (VERDICT r14 #2): the drift/gate
  * monitors append one 1-row `batch=N` dir per microbatch forever —
  * the fold bounds the directory count while preserving the monitor
  * TIME SERIES exactly (folded rows keep their original batch in
  * `mbatch`; [[StreamingRelease.readMonitor]] reconstructs it). Unlike
  * the ledger fold there is no as-of refusal: nothing is lost. */
class MonitorFoldSpec extends AnyFunSuite {
  import SparkTestSession._

  private def withDir[T](body: String => T): T = {
    val dir = Files.createTempDirectory("graft-monfold-")
    try body(dir.toString)
    finally graft.store.ModelStore.deleteRecursively(dir)
  }

  /** One monitor row in the drift-gate shape (n_cur, psi, rebuild). */
  private def writeRow(path: String, b: Long): Unit = {
    val s = spark; import s.implicits._
    Seq((b * 10, b * 0.5, b % 3 == 0L)).toDF("n_cur", "psi", "rebuild")
      .write.mode("overwrite").parquet(s"$path/batch=$b")
  }

  private def series(path: String): Seq[(Long, Long, Double, Boolean)] =
    StreamingRelease.readMonitor(spark, path).get
      .select(col("batch"), col("n_cur"), col("psi"), col("rebuild"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3)))
      .sortBy(_._1).toSeq

  private def dirCount(path: String): Int = {
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(Files.list(java.nio.file.Paths.get(path)))(
      _.iterator().asScala.count(
        _.getFileName.toString.startsWith("batch=")))
  }

  test("50-batch soak: monitor read bit-identical across every fold, boundary advances, directory count stays bounded") {
    withDir { path =>
      assert(StreamingRelease.readMonitor(spark, path).isEmpty)
      var expected = Vector.empty[(Long, Long, Double, Boolean)]
      var boundary = -1L
      (0L until 50L).foreach { b =>
        writeRow(path, b)
        expected :+= ((b, b * 10, b * 0.5, b % 3 == 0L))
        if (b > 0 && b % 8 == 0) {
          val upTo = b - 4
          val fired = StreamingRelease.compactMonitorStore(spark, path,
            upTo)
          assert(fired, s"fold at batch $b (upTo $upTo) did not fire")
          val nb = StreamingRelease.ledgerFoldBoundary(spark, path).get
          assert(nb == upTo && nb > boundary,
            s"boundary $nb did not advance past $boundary to $upTo")
          boundary = nb
        }
        // the series is exact after every write and every fold
        assert(series(path) == expected,
          s"monitor series diverged at batch $b")
        // dir count bounded: keepRecent window + the fold target, never
        // the b+1 dirs an unfolded store accumulates
        assert(dirCount(path) <= 13,
          s"batch $b: ${dirCount(path)} dirs — fold is not bounding")
      }
      assert(dirCount(path) <= 13 && expected.size == 50)
    }
  }

  test("fold refuses no-ops and replay-unsafe targets; a re-fold after completion is a clean no-op") {
    withDir { path =>
      writeRow(path, 0L)
      // one dir: nothing to fold
      assert(!StreamingRelease.compactMonitorStore(spark, path, 0L))
      writeRow(path, 1L)
      // newest dir is the target: replay-unsafe, refused
      assert(!StreamingRelease.compactMonitorStore(spark, path, 1L))
      writeRow(path, 2L)
      assert(StreamingRelease.compactMonitorStore(spark, path, 1L))
      val after = series(path)
      assert(after.map(_._1) == Seq(0L, 1L, 2L))
      // sources are gone, so a repeat fold has nothing foldable
      assert(!StreamingRelease.compactMonitorStore(spark, path, 1L))
      assert(series(path) == after)
    }
  }

  test("fold of a previously-folded store keeps every original batch number (mbatch carried forward)") {
    withDir { path =>
      (0L to 2L).foreach(writeRow(path, _))
      assert(StreamingRelease.compactMonitorStore(spark, path, 1L))
      (3L to 5L).foreach(writeRow(path, _))
      // second fold sweeps the previously-folded dir (batch=1) along
      assert(StreamingRelease.compactMonitorStore(spark, path, 4L))
      assert(series(path).map(_._1) == (0L to 5L))
      assert(dirCount(path) == 2) // batch=4 (folded) + batch=5 (live)
      // a replayed recent batch overwrites only its own dir
      writeRow(path, 5L)
      assert(series(path).map(_._1) == (0L to 5L))
    }
  }
}

package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.store.ModelStore

/** The train-once/serve-many contract (VERDICT r6 #1): every trained
  * artifact round-trips the versioned [[ModelStore]] byte-exactly, and
  * serving from the store is bit-identical to the train-inline path
  * (the oracle gate additionally pins the persisted queries against the
  * in-query oracles at sf0.01). */
class ModelStoreSpec extends AnyFunSuite {
  import SparkTestSession._

  private def withStore[T](body: ModelStore => T): T = {
    val dir = Files.createTempDirectory("graft-modelstore-spec-")
    try body(new ModelStore(spark, dir.toString))
    finally {
      // best-effort cleanup via the store object's own helper
      import scala.jdk.CollectionConverters._
      Files.walk(dir).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
  }

  /** Exact frame equality: same schema field names/types, same multiset
    * of rows (compared on a canonical sort of the stringified rows —
    * doubles printed via toString round-trip bits for finite values). */
  private def assertSameFrame(a: DataFrame, b: DataFrame): Unit = {
    assert(a.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      b.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val sa = a.collect().map(_.toString).sorted
    val sb = b.collect().map(_.toString).sorted
    assert(sa.toSeq === sb.toSeq)
  }

  test("save/load round-trips longs and doubles byte-exactly, versions advance, old versions stay readable") {
    withStore { store =>
      assert(store.currentVersion.isEmpty)
      assert(store.partNames.isEmpty)
      import spark.implicits._
      val w1 = Seq((1, 3L, 0.1 + 0.2), (2, -7L, 1e-300)).toDF("k", "n", "x")
      val v0 = store.save(Map("weights" -> w1))
      assert(v0 === 0L)
      assert(store.currentVersion === Some(0L))
      assert(store.partNames === Seq("weights"))
      // bit-exact round trip, including a non-representable double
      assertSameFrame(store.load("weights"), w1)
      val bits = store.load("weights").filter($"k" === 1)
        .collect()(0).getDouble(2)
      assert(java.lang.Double.doubleToRawLongBits(bits) ===
        java.lang.Double.doubleToRawLongBits(0.1 + 0.2))
      // retrain: new version becomes current; the pinned old version
      // still serves (a long scoring job survives a mid-flight retrain)
      val w2 = Seq((1, 4L, 2.5)).toDF("k", "n", "x")
      val v1 = store.save(Map("weights" -> w2, "extra" -> w1))
      assert(v1 === 1L)
      assert(store.partNames === Seq("extra", "weights"))
      assertSameFrame(store.load("weights"), w2)
      assertSameFrame(store.loadAt(0L, "weights"), w1)
      // missing part / empty store fail loud
      intercept[IllegalArgumentException](store.load("nope"))
    }
  }

  test("part names are validated") {
    withStore { store =>
      import spark.implicits._
      val df = Seq(1).toDF("x")
      intercept[IllegalArgumentException](store.save(Map("" -> df)))
      intercept[IllegalArgumentException](store.save(Map("a/b" -> df)))
      intercept[IllegalArgumentException](store.save(Map("_cur" -> df)))
      intercept[IllegalArgumentException](store.save(Map.empty))
    }
  }

  test("persisted IVF-PQ index serves bit-identically to the in-query search") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val inline = llm.Similarity.ivfPqSearch(emb).collect().map(_.toString)
    withStore { store =>
      llm.Similarity.saveIvfPqIndex(emb, store)
      // all four artifacts present
      assert(store.partNames === Seq("cells", "coarse", "codebooks", "codes"))
      val qVec = emb.filter(col("vec_id") === 0L)
        .select(posexplode(col("embedding")).as(Seq("i", "x")))
        .collect().map(r => r.getInt(0) -> r.getFloat(1).toDouble).toMap
      val served = llm.Similarity
        .ivfPqSearchPersisted(store, qVec, qId = 0L)
        .collect().map(_.toString)
      assert(served.toSeq === inline.toSeq)
    }
  }

  test("annRecall: monotone in nprobe, exhaustive probe equals the pure PQ ranking") {
    val rows = llm.Similarity.annRecall(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 4))
    val recalls = rows.map(_.getDouble(3))
    recalls.foreach(r => assert(r >= 0.0 && r <= 1.0, recalls.toSeq))
    // NOT asserted: monotonicity in nprobe. The candidate SET is
    // monotone, but recall against exact-cosine truth is not — ADC
    // ranks by squared L2 over unnormalized vectors, so a wider probe
    // can admit a close-in-L2/wrong-in-cosine candidate that displaces
    // a true neighbor from the top-k (observed: 0.2, 0.2, 0.1 at
    // sf0.001). Surfacing that metric mismatch is the point of the
    // measurement row.
    // nprobe = kCells probes every cell, so the IVF layer prunes
    // nothing: the search must return exactly the full-corpus ADC
    // top-k — any residual recall loss is PQ quantization, not probing
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val exhaustive = llm.Similarity
      .ivfPqSearch(emb, nprobe = 4, kCells = 4).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val pureAdc = llm.Similarity.pqAdc(emb).orderBy(asc("adc"), asc("vec_id"))
      .limit(10).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(exhaustive.toSeq == pureAdc.toSeq)
  }

  test("persisted BPE / LM / classifier serve bit-identically to train-inline") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    withStore { store =>
      llm.TextOps.bpeSave(docs, store)
      assertSameFrame(llm.TextOps.bpeEncodePersisted(docs, store),
        llm.TextOps.bpeEncode(docs))
      // the persisted merge list equals the train query's output
      assertSameFrame(store.load("merges"), llm.TextOps.bpeTrain(docs))
    }
    withStore { store =>
      llm.TextOps.lmSave(docs, store)
      assertSameFrame(llm.TextOps.lmPerplexityPersisted(docs, store),
        llm.TextOps.lmPerplexityOf(docs))
    }
    withStore { store =>
      llm.Classifier.clfSave(docs, store)
      assertSameFrame(llm.Classifier.clfScorePersisted(docs, store),
        llm.Classifier.clfScore(docs))
    }
  }

  test("scratch harness materializes the result and removes the store directory") {
    import spark.implicits._
    var path: String = null
    val out = ModelStore.scratch(spark, "spec") { store =>
      store.save(Map("m" -> Seq((1L, 2.0)).toDF("a", "b")))
      path = store.load("m").inputFiles.head
      store.load("m")
    }
    // the served frame survives the deletion (eager checkpoint)...
    assert(out.collect().map(_.toString).toSeq === Seq("[1,2.0]"))
    // ...and the scratch directory is gone
    assert(!Files.exists(java.nio.file.Paths.get(
      new java.net.URI(path).getPath)))
  }
}

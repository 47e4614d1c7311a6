package graft
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.store.ModelStore
class DriftDebugSpec extends AnyFunSuite {
  import SparkTestSession._
  test("debug residual hist") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = emb.filter(col("vec_id") % 3 =!= 0)
    val held = emb.filter(col("vec_id") % 3 === 0)
    val dirS = java.nio.file.Files.createTempDirectory("dbg-store-")
    val store = new ModelStore(spark, dirS.toString)
    llm.Similarity.saveIvfPqIndex(base, store)
    val coarse = store.load("coarse")
    val db = llm.Similarity.assignDistances(base, coarse)
    val dh = llm.Similarity.assignDistances(held, coarse)
    println("base d stats: " + db.agg(min("d"), max("d"), avg("d"), expr("percentile(d, 0.5)")).collect().head)
    println("held d stats: " + dh.agg(min("d"), max("d"), avg("d"), expr("percentile(d, 0.5)")).collect().head)
    val e = db.agg(min("d").as("vmin"), max("d").as("vmax")).collect().head
    val (vmin, vmax) = (e.getDouble(0), e.getDouble(1))
    def hist(df: org.apache.spark.sql.DataFrame) = df.select(
      graft.operators.StatTests.bucketCol(col("d"), lit(vmin), lit(vmax), 10).as("b"))
      .groupBy("b").count().orderBy("b").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    println("base hist: " + hist(db).toSeq.sorted)
    println("held hist: " + hist(dh).toSeq.sorted)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Similarity

/** Differential tests for the native FloatVecDot expression against the
  * interpreted zip_with+aggregate fold it replaced. */
class FloatVecDotSpec extends AnyFunSuite {
  import SparkTestSession._

  test("native dot is bit-identical to the fold over real embeddings") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cmp = e.crossJoin(broadcast(
        e.filter(col("vec_id") === 0).select(col("embedding").as("q"))))
      .select(
        Similarity.dot(col("embedding"), col("q")).as("native"),
        Similarity.dotFold(col("embedding"), col("q")).as("fold"))
      .filter(col("native") =!= col("fold") ||
        col("native").isNull =!= col("fold").isNull)
    assert(cmp.count() == 0)
  }

  test("native dot matches fold edge cases: null element, length mismatch") {
    import spark.implicits._
    val rows = Seq(
      (Array(1.0f, 2.0f), Array(3.0f, 4.0f)),      // plain: 11.0
      (Array(1.0f), Array(3.0f, 4.0f)),             // length mismatch: null
      (Array.empty[Float], Array.empty[Float]))     // empty: 0.0
      .toDF("a", "b")
      // null element case needs a nullable array
      .unionByName(Seq(1).toDF("x").select(
        array(lit(1.0f), lit(null).cast("float")).as("a"),
        array(lit(1.0f), lit(2.0f)).as("b")).drop("x"))
    val got = rows.select(
        Similarity.dot(col("a"), col("b")).as("native"),
        Similarity.dotFold(col("a"), col("b")).as("fold"))
      .collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getDouble(0)),
        if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(got.forall { case (n, f) => n == f }, got.mkString(", "))
    assert(got.map(_._1).toSeq ==
      Seq(Some(11.0), None, Some(0.0), None))
  }

  test("native dot compiles under codegen with fallback disabled") {
    val prior = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val n = e.crossJoin(broadcast(
          e.filter(col("vec_id") === 0).select(col("embedding").as("q"))))
        .select(Similarity.dot(col("embedding"), col("q")).as("d"))
        .filter(col("d").isNotNull).count()
      assert(n > 0)
    } finally spark.conf.set("spark.sql.codegen.fallback", prior)
  }
}

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

  test("fused cosine is bit-identical to the composed dot/norm form") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cmp = e.crossJoin(broadcast(
        e.filter(col("vec_id") === 0).select(col("embedding").as("q"))))
      .select(
        Similarity.cosine(col("embedding"), col("q")).as("fused"),
        Similarity.cosineComposed(col("embedding"), col("q")).as("composed"))
      .filter(col("fused") =!= col("composed") ||
        col("fused").isNull =!= col("composed").isNull)
    assert(cmp.count() == 0)
  }

  test("fused cosine edge cases match the composed form") {
    import spark.implicits._
    val rows = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),   // identical: 1.0
      (Array(1.0f), Array(3.0f, 4.0f)))          // length mismatch: null
      .toDF("a", "b")
    val got = rows.select(
        Similarity.cosine(col("a"), col("b")).as("f"),
        Similarity.cosineComposed(col("a"), col("b")).as("c"))
      .collect()
    got.foreach { r =>
      val f = if (r.isNullAt(0)) None else Some(r.getDouble(0))
      val c = if (r.isNullAt(1)) None else Some(r.getDouble(1))
      assert(f.map(java.lang.Double.doubleToLongBits(_)) ==
        c.map(java.lang.Double.doubleToLongBits(_)), s"$f vs $c")
    }
  }

  test("fused cosine survives a zero-norm vector where ANSI composed throws") {
    import spark.implicits._
    val rows = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val fused = rows.select(Similarity.cosine(col("a"), col("b")).as("f"))
      .collect().head
    assert(!fused.isNullAt(0) && fused.getDouble(0).isNaN)
    // the composed form under ANSI (Spark 4 default) kills the whole job
    val thrown = intercept[Exception] {
      rows.select(Similarity.cosineComposed(col("a"), col("b"))).collect()
    }
    assert(thrown.getMessage.contains("DIVIDE_BY_ZERO"), thrown.getMessage)
  }

  test("non-float array inputs fail analysis, not silently return garbage") {
    import spark.implicits._
    val doubles = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    for (f <- Seq(
        graft.functions.FloatVecDot.float_vec_dot _,
        graft.functions.FloatVecCosine.float_vec_cosine _)) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        doubles.select(f(col("a"), col("b"))).collect()
      }
      assert(e.getMessage.contains("ARRAY<FLOAT>"), e.getMessage)
    }
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

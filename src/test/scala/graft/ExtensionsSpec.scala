package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extension point must expose every custom expression to plain SQL. */
class ExtensionsSpec extends AnyFunSuite {

  test("all custom expressions resolve and evaluate through SQL") {
    // the suite shares one SparkSession (builder-time withExtensions is a
    // no-op on getOrCreate of an existing session) — use the runtime
    // install path, which registers the SAME function list
    val spark = SparkTestSession.spark
    GraftExtensions.install(spark)
    try {
      def one(sql: String): Any = spark.sql(s"SELECT $sql").collect().head.get(0)
      def seq1(sql: String): List[String] =
        spark.sql(s"SELECT $sql").collect().head.getSeq[String](0).toList
      assert(one("float_vec_dot(array(cast(1.0 as float), cast(2.0 as float))," +
        " array(cast(3.0 as float), cast(4.0 as float)))") == 11.0)
      val cos = one("float_vec_cosine(array(cast(1.0 as float))," +
        " array(cast(2.0 as float)))").asInstanceOf[Double]
      assert(math.abs(cos - 1.0) < 1e-12)
      assert(seq1("map_added_keys(map('a','1','b','2'), map('a','1'))") ==
        List("b"))
      assert(seq1("map_deleted_keys(map('a','1'), map('a','1','z','9'))") ==
        List("z"))
      assert(seq1("map_changed_keys(map('a','1'), map('a','2'))") ==
        List("a"))
      assert(seq1("map_keys(map_scrub(map('a','[1]','b','2')))") ==
        List("b"))
      assert(seq1("map_keys(relationship_diff(" +
        "map('p', array(named_struct('g','1'))), " +
        "map('p', array(named_struct('g','1')))))").isEmpty)
      assert(one("json_canonicalize('{\"b\":1,\"a\":2}')") != null)
      // bloom: all-ones bitset says might for anything; all-zeros never
      assert(one("bloom_might_contain('x', X'FF', 2, 8)") == true)
      assert(one("bloom_might_contain('x', X'00', 2, 8)") == false)
      // non-literal bitset = analysis error naming the argument
      val nf = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT bloom_might_contain('x', encode(rand()::string, 'utf-8'), 2, 8)")
          .collect()
      }
      assert(nf.getMessage.contains("bits"), nf.getMessage)
      // malformed geometry = analysis error, never an executor crash
      val geo = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT bloom_might_contain('x', X'FF', 2, 8192)").collect()
      }
      assert(geo.getMessage.contains("8192"), geo.getMessage)
      // a foldable wrong-typed literal names the argument too
      val wt = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT bloom_might_contain('x', X'FF', '2', 8)").collect()
      }
      assert(wt.getMessage.contains("nh"), wt.getMessage)
      // wrong arity = analysis error naming the function, not an IOOBE
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT float_vec_dot(array(cast(1.0 as float)))").collect()
      }
      assert(e.getMessage.contains("float_vec_dot"), e.getMessage)
      // unicode_normalize: decomposed a + U+0300 recomposes to U+00E0
      assert(one("unicode_normalize('a\\u0300', 'NFC')") == "\u00e0")
      // NFKC folds the fi ligature (U+FB01) to two letters
      assert(one("unicode_normalize('\\ufb01', 'NFKC')") == "fi")
      // invalid form = analysis error, never a per-row crash
      val uf = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT unicode_normalize('x', 'NFX')").collect()
      }
      assert(uf.getMessage.contains("NFX"), uf.getMessage)
    } finally () // shared-session semantics: do not stop the singleton
  }

  test("unicode_normalize: ASCII fast path is the identity; forms agree with Normalizer") {
    import org.apache.spark.sql.functions.col
    val spark = SparkTestSession.spark
    val docs = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
    // the fixture corpus is ASCII: every form must pass text through unchanged
    graft.functions.UnicodeNormalize.forms.foreach { f =>
      val diff = docs.filter(
        graft.functions.UnicodeNormalize.unicode_normalize(col("text"), f)
          =!= col("text")).count()
      assert(diff == 0, s"form $f mutated ASCII text")
    }
    // non-ASCII differential vs java.text.Normalizer, through the engine
    import spark.implicits._
    val samples = Seq("àbc", "ﬁn", "é́", "éx", "")
    val got = samples.toDF("s")
      .select(col("s"), graft.functions.UnicodeNormalize
        .unicode_normalize(col("s"), "NFKC").as("n"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    samples.foreach { s =>
      val want = java.text.Normalizer.normalize(
        s, java.text.Normalizer.Form.NFKC)
      assert(got(s) == want, s"NFKC of ${s.map(_.toInt.toHexString)}")
    }
  }
}

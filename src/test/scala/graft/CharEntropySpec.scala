package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CharEntropy
import org.apache.spark.unsafe.types.UTF8String

/** Kernel + registration tests for the native char-entropy expression
  * (the oracle row pins engine-vs-engine values on the corpus; these pin
  * the math on known-answer strings and the codegen/SQL paths). */
class CharEntropySpec extends AnyFunSuite {
  import SparkTestSession._

  private def h(s: String): Double =
    CharEntropy.entropy(UTF8String.fromString(s))

  test("known-answer values") {
    assert(h("") == 0.0)
    assert(h("aaaa") == 0.0) // one symbol: no uncertainty
    assert(h("ab") == 1.0) // two equiprobable symbols: exactly 1 bit
    assert(h("abcd") == 2.0) // four: exactly 2 bits
    assert(math.abs(h("aab") - 0.9182958340544896) < 1e-12) // -2/3·lg(2/3) - 1/3·lg(1/3)
  }

  test("surrogate pairs count as ONE codepoint") {
    // U+1D11E (musical G clef) is 2 Java chars; "X" + clef = 2 codepoints
    val clef = new String(Character.toChars(0x1D11E))
    assert(h(s"X$clef") == 1.0)
    assert(h(clef * 4) == 0.0)
  }

  test("quality band: natural text mid, spam low, base64-ish high") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val spam = "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaab"
    val b64 = "QmFzZTY0IGJsb2JzIGxvb2sgbGlrZSB0aGlzIDAxMjM0NTY3ODkrLw=="
    assert(h(spam) < 1.0)
    assert(h(text) > 3.0 && h(text) < 4.5)
    assert(h(b64) > h(text))
  }

  test("null propagates, and the SQL registration evaluates via codegen") {
    val s = spark; import s.implicits._
    GraftExtensions.install(s)
    val out = Seq(("abab", true), (null.asInstanceOf[String], false))
      .toDF("t", "present")
      .selectExpr("char_entropy(t) AS e", "present")
      .collect().map(r => r.getAs[Boolean]("present") ->
        (if (r.isNullAt(0)) None else Some(r.getDouble(0)))).toMap
    assert(out(true).contains(1.0))
    assert(out(false).isEmpty)
  }

  test("matches an independent relational formulation on the corpus slice") {
    val s = spark; import s.implicits._
    val docs = Seq(
      1L -> "the cat sat on the mat",
      2L -> "zzzzzzzz",
      3L -> "a1b2c3d4e5!@#").toDF("doc_id", "text")
    val native = graft.functions.CharEntropy.char_entropy(col("text"))
    val viaExplode = docs
      .select(col("doc_id"), explode(split(col("text"), "")).as("c"))
      .groupBy("doc_id", "c").agg(count(lit(1)).as("k"))
      .groupBy("doc_id").agg(
        sum(col("k")).as("n"),
        collect_list(struct(col("c"), col("k"))).as("ck"))
      .select(col("doc_id"),
        (-aggregate(array_sort(col("ck")), lit(0.0), (acc, x) => {
          val p = x.getField("k").cast("double") / col("n").cast("double")
          acc + p * log(p) / log(lit(2.0))
        })).as("ref"))
    val joined = docs.select(col("doc_id"), native.as("ent"))
      .join(viaExplode, "doc_id").collect()
    joined.foreach { r =>
      assert(math.abs(r.getAs[Double]("ent") - r.getAs[Double]("ref")) < 1e-9,
        s"doc ${r.getAs[Long]("doc_id")}")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DiffOps
import graft.functions.JsonCanonicalize

/** Property-based diff-algebra laws (SURVEY §5.2.2):
  *   diff(e, e) = ∅ ; added ⊎ changed ⊎ deleted = nonMatching ;
  *   added(n, o) = deleted(o, n).
  * 200 seeded random map pairs, evaluated columnar in ONE job per law —
  * the same expressions the engine runs. */
class DiffLawsSpec extends AnyFunSuite {
  import SparkTestSession._

  private val rnd = new scala.util.Random(42)
  private val keys = Seq("a", "b", "c", "d", "e", "f")
  private def randMap(): Map[String, String] =
    keys.filter(_ => rnd.nextBoolean())
      .map(k => k -> (if (rnd.nextInt(4) == 0) null
        else rnd.nextInt(3).toString)).toMap
  private val pairs: Seq[(Map[String, String], Map[String, String])] =
    Seq.fill(200)((randMap(), randMap()))

  private def diffed(ps: Seq[(Map[String, String], Map[String, String])]) = {
    import spark.implicits._
    ps.toDF("n", "o").select(
      DiffOps.addedKeys(col("n"), col("o")).as("added"),
      DiffOps.changedKeys(col("n"), col("o")).as("changed"),
      DiffOps.deletedKeys(col("n"), col("o")).as("deleted"),
      DiffOps.nonMatchingKeys(col("n"), col("o")).as("nonMatching"))
      .collect()
      .map(r => (r.getSeq[String](0).toSeq, r.getSeq[String](1).toSeq,
        r.getSeq[String](2).toSeq, r.getSeq[String](3).toSeq))
  }

  test("diff(e, e) is empty") {
    diffed(pairs.map { case (n, _) => (n, n) }).foreach {
      case (a, c, d, nm) =>
        assert(a.isEmpty && c.isEmpty && d.isEmpty && nm.isEmpty)
    }
  }

  test("added ⊎ changed ⊎ deleted = nonMatching, pairwise disjoint") {
    diffed(pairs).foreach { case (a, c, d, nm) =>
      assert((a ++ c ++ d).sorted == nm.sorted)
      assert(a.toSet.intersect(c.toSet).isEmpty)
      assert(a.toSet.intersect(d.toSet).isEmpty)
      assert(c.toSet.intersect(d.toSet).isEmpty)
    }
  }

  test("added(n, o) = deleted(o, n)") {
    val fwd = diffed(pairs)
    val bwd = diffed(pairs.map(_.swap))
    fwd.zip(bwd).foreach { case ((a1, _, _, _), (_, _, d2, _)) =>
      assert(a1.sorted == d2.sorted)
    }
  }

  test("json_canonicalize is SQL-registered (function registry + extensions)") {
    JsonCanonicalize.register(spark)
    val r = spark.sql(
      """SELECT json_canonicalize('{"b": 1, "a": 2}') AS c""").collect().head
    assert(r.getString(0) == """{"a":2,"b":1}""")
  }

  test("json canonicalization is idempotent and key-order invariant") {
    val j1 = """{"b": 1, "a": {"y": [1, 2], "x": null}}"""
    val j2 = """{"a": {"x": null, "y": [1,2]}, "b": 1}"""
    import spark.implicits._
    val r = Seq((j1, j2)).toDF("x", "y").select(
      JsonCanonicalize.json_canonicalize(col("x")).as("cx"),
      JsonCanonicalize.json_canonicalize(col("y")).as("cy"))
      .collect().head
    assert(r.getString(0) == r.getString(1))
    assert(r.getString(0) == """{"a":{"x":null,"y":[1,2]},"b":1}""")
    // idempotent + non-JSON passthrough
    val r2 = Seq((r.getString(0), "plain text")).toDF("x", "y").select(
      JsonCanonicalize.json_canonicalize(col("x")),
      JsonCanonicalize.json_canonicalize(col("y"))).collect().head
    assert(r2.getString(0) == r.getString(0))
    assert(r2.getString(1) == "plain text")
  }
}

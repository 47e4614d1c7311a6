package graft

import org.scalatest.funsuite.AnyFunSuite

/** The durable-minima fold contract (VERDICT r11 #1): latest.json is
  * only ever min-folded — a fresh run can lower rows and add new ones,
  * but can never raise a row, drop a row, drop the note, or fold across
  * scale factors. The r11 record corruption came from Bench overwriting
  * the record with a loaded-box run; these laws make that impossible. */
class BenchFoldSpec extends AnyFunSuite {

  private def rec(sf: String, note: Option[String],
      qs: (String, Double)*): String = {
    val body = qs.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    s"""{"metric":"total","value":${qs.map(_._2).sum},"unit":"sec","queries":$body,"sf":"$sf","failed":[]""" +
      note.map(n => s""","note":"$n"""").getOrElse("") + "}"
  }

  test("fold takes per-query minima, keeps one-sided rows, preserves the note") {
    val old = rec("/d/sf0.1", Some("minima over two runs"),
      "q_a" -> 1.0, "q_b" -> 2.0, "q_gone" -> 3.0)
    val run = rec("/d/sf0.1", None,
      "q_a" -> 0.5, "q_b" -> 9.0, "q_new" -> 4.0)
    val out = Bench.foldRecord(old, run).get
    val q = Bench.queriesOf(out)
    assert(q === Map("q_a" -> 0.5, "q_b" -> 2.0, "q_gone" -> 3.0,
      "q_new" -> 4.0))
    assert(out.contains(""""note":"minima over two runs""""))
    // the total is the sum of the folded minima
    assert(out.contains(s""""value":${0.5 + 2.0 + 3.0 + 4.0}"""))
  }

  test("a fold can never raise a row: a uniformly-worse run is a no-op on every shared row") {
    val old = rec("/d/sf0.1", Some("n"), "q_a" -> 1.0, "q_b" -> 2.0)
    val run = rec("/d/sf0.1", None, "q_a" -> 5.0, "q_b" -> 7.0)
    val q = Bench.queriesOf(Bench.foldRecord(old, run).get)
    assert(q === Map("q_a" -> 1.0, "q_b" -> 2.0))
  }

  test("folding across scale factors is refused") {
    val old = rec("/d/sf0.1", None, "q_a" -> 1.0)
    val run = rec("/d/sf0.01", None, "q_a" -> 0.1)
    assert(Bench.foldRecord(old, run).isEmpty)
  }

  test("a pretty-printed record (the python tool's json.dump format) folds, not silently no-ops") {
    // the first wiring of the in-Bench fold missed this: the repo record
    // is pretty-printed, the compact-only regexes matched nothing, and
    // the SF guard quietly refused every fold
    val old =
      """{
        |  "metric": "total",
        |  "value": 3.0,
        |  "queries": {
        |    "q_a": 1.0,
        |    "q_b": 2.0
        |  },
        |  "sf": "/d/sf0.1",
        |  "note": "kept note"
        |}""".stripMargin
    assert(Bench.queriesOf(old) === Map("q_a" -> 1.0, "q_b" -> 2.0))
    val out = Bench.foldRecord(old,
      rec("/d/sf0.1", None, "q_a" -> 0.4, "q_b" -> 5.0)).get
    assert(Bench.queriesOf(out) === Map("q_a" -> 0.4, "q_b" -> 2.0))
    assert(out.contains(""""note":"kept note""""))
  }

  test("fold output is re-foldable (the record stays machine-readable)") {
    val old = rec("/d/sf0.1", Some("n"), "q_a" -> 1.0)
    val r1 = Bench.foldRecord(old,
      rec("/d/sf0.1", None, "q_a" -> 0.8, "q_b" -> 2.0)).get
    val r2 = Bench.foldRecord(r1,
      rec("/d/sf0.1", None, "q_a" -> 0.9, "q_b" -> 1.5)).get
    assert(Bench.queriesOf(r2) === Map("q_a" -> 0.8, "q_b" -> 1.5))
    assert(r2.contains(""""note":"n""""))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's error-surfacing contract (r12 verdict #1): a
  * thrown probe leg must produce an explicit "err" marker in the
  * scale-probe JSON, never a 0-second timing that reads as a
  * sub-linear success. Pure string-level checks — no Spark session. */
class BenchProbeSpec extends AnyFunSuite {

  test("healthy probe entry renders [x1, x10, ratio]") {
    assert(Bench.probeEntryJson("q", 1.5, 12.0) == "\"q\":[1.5,12,8]")
  }

  test("a broken x10 leg renders err in the slot AND the ratio") {
    assert(Bench.probeEntryJson("q", 1.7, Double.NaN) ==
      "\"q\":[1.7,\"err\",\"err\"]")
  }

  test("a broken x1 leg renders err in the slot AND the ratio") {
    assert(Bench.probeEntryJson("q", Double.NaN, 9.0) ==
      "\"q\":[\"err\",9,\"err\"]")
  }

  test("err entries are valid JSON") {
    // the driver parses the metric line as JSON; the marker must parse
    val json = "{" + Bench.probeEntryJson("q", Double.NaN, Double.NaN) + "}"
    // minimal structural check without a JSON lib: balanced + quoted
    assert(json == "{\"q\":[\"err\",\"err\",\"err\"]}")
  }
}

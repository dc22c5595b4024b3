package graft

import org.scalatest.funsuite.AnyFunSuite

/** Host-control plumbing (ADVICE r16 + VERDICT r16 task 1): the
  * baseline parse must survive format evolution instead of silently
  * degrading the control to null, and the arithmetic helpers must be
  * exact on the shapes the artifact actually carries. */
class BenchControlSpec extends AnyFunSuite {

  test("numberMap extracts a flat map regardless of field order") {
    val txt = """{"value":1.5,"medians":{"q_a":0.5,"q_b":2.0},"queries":{"q_a":0.4,"q_b":1.75}}"""
    assert(Bench.numberMap(txt, "queries") == Map("q_a" -> 0.4, "q_b" -> 1.75))
    assert(Bench.numberMap(txt, "medians") == Map("q_a" -> 0.5, "q_b" -> 2.0))
  }

  test("numberMap is balanced-brace, not first-'}' (the r16 defect)") {
    // a nested object BEFORE the values would have truncated the r16
    // indexOf('}') scan to the inner close
    val txt = """{"queries":{"nested":{"q_x":9.0},"q_a":0.4,"q_b":1.75},"tail":1}"""
    val m = Bench.numberMap(txt, "queries")
    assert(m("q_a") == 0.4 && m("q_b") == 1.75)
  }

  test("numberMap does not mistake n_queries for queries") {
    val txt = """{"n_queries":135,"queries":{"q_a":0.4}}"""
    assert(Bench.numberMap(txt, "queries") == Map("q_a" -> 0.4))
  }

  test("numberMap admits Double.toString E-notation incl. negative exponents") {
    // a sub-1e-3 timing serializes as "1.0E-5" in the queries map
    val txt = """{"queries":{"q_tiny":1.0E-5,"q_neg":-2.5,"q_exp":1.5E2}}"""
    val m = Bench.numberMap(txt, "queries")
    assert(m("q_tiny") == 1.0e-5 && m("q_neg") == -2.5 && m("q_exp") == 150.0)
  }

  test("numberMap on a missing key is empty, not a crash") {
    assert(Bench.numberMap("""{"value":1}""", "queries").isEmpty)
    assert(Bench.numberMap("""{"queries":{"q_a":0.4""", "queries").isEmpty) // unbalanced
  }

  test("median: odd, even, empty") {
    assert(Bench.median(Vector(3.0, 1.0, 2.0)) == 2.0)
    assert(Bench.median(Vector(4.0, 1.0, 2.0, 3.0)) == 2.5)
    assert(Bench.median(Vector.empty) == -1.0)
  }
}

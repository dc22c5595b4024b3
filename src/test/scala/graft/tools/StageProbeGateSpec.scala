package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The daemonfloor artifact's self-evaluated gate (VERDICT r17
  * task 2): the SCALE.md anchor check as pass booleans, and the
  * quiet-session detector that re-confirms (or re-anchors) the
  * per-batch intercept floor instead of carrying it on authority. */
class StageProbeGateSpec extends AnyFunSuite {

  // the r17 artifact's actual vectors: bursty (rep 1 ~2x), no two
  // consecutive quiet reps — gate passes on the mins, detector silent
  private val r17d1 = Vector(21.05, 10.84, 10.39, 13.39, 9.29)
  private val r17d3 = Vector(46.47, 24.35, 28.29, 21.98, 24.67)

  test("anchor gate passes on the min-window drains (r17 shape)") {
    val g = StageProbe.daemonfloorGateJson(r17d1, r17d3)
    assert(g.contains(""""drain_1batch_min":[9.29,10.47,true]"""), g)
    assert(g.contains(""""drain_3batch_min":[21.98,23.10,true]"""), g)
    assert(g.contains(""""pass":true"""), g)
    assert(g.contains(""""quiet":{"fired":false}"""), g)
  }

  test("a structural regression (every rep elevated) fails the gate") {
    val g = StageProbe.daemonfloorGateJson(
      r17d1.map(_ + 5), r17d3.map(_ + 10))
    assert(g.contains(""""pass":false"""), g)
  }

  test("quiet detector: two consecutive anchor-level reps fire it and " +
      "read the intercept from that window") {
    // reps 3 and 4 are a quiet pair at anchor level (within 15% of
    // each other and of 9.52 / 21.00); f = (20.5 - 9.4) / 2 = 5.55
    val d1 = Vector(21.05, 10.84, 9.40, 9.60, 13.0)
    val d3 = Vector(46.47, 24.35, 20.50, 21.20, 30.0)
    val g = StageProbe.daemonfloorGateJson(d1, d3)
    assert(g.contains(""""fired":true"""), g)
    assert(g.contains(""""reps":[3,4]"""), g)
    assert(g.contains(""""intercept_f":5.55"""), g)
    // 5.55 > 5.5: recorded for re-anchoring, not silently confirmed
    assert(g.contains(""""floor_confirmed":false"""), g)
    // a genuinely quiet window below the floor confirms it
    val g2 = StageProbe.daemonfloorGateJson(
      Vector(9.40, 9.60), Vector(19.8, 20.5))
    assert(g2.contains(""""fired":true""") &&
      g2.contains(""""floor_confirmed":true"""), g2)
  }

  test("consecutive-but-not-anchor-level reps do not fire the detector") {
    // reps agree within 15% but sit 2x above the anchors — a steady
    // BUSY host is not a quiet session
    val g = StageProbe.daemonfloorGateJson(
      Vector(20.0, 21.0, 20.5), Vector(44.0, 45.0, 44.5))
    assert(g.contains(""""fired":false"""), g)
    assert(g.contains(""""pass":false"""), g)
  }
}

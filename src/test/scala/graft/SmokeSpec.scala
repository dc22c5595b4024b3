package graft

/** End-to-end smoke: every registered query runs and returns rows at
  * sf0.001. Value-level correctness is the driver's DuckDB-oracle gate;
  * targeted semantics tests live in the per-module specs. */
class SmokeSpec extends SparkSpec {
  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  Queries.all.foreach { case (name, fn) =>
    test(s"$name runs and returns rows") {
      val df = fn(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("every query has an oracle or is explicitly rows-only") {
    val noOracle = Queries.all.keySet -- Queries.oracles.keySet
    assert(noOracle.forall(Queries.rowsOnly.contains),
      s"queries missing oracle SQL without rows-only justification: $noOracle")
  }
}

package graft.ops

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** As-of join semantics: inclusive boundary, per-key isolation,
  * no-match nulls, deterministic equal-ts pick, brute-force equality. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("nearest prior right row per key, inclusive at equal ts") {
    val left = Seq((1L, 10L, ts(100)), (2L, 10L, ts(200)), (3L, 20L, ts(150)))
      .toDF("id", "k", "ts")
    val right = Seq((10L, ts(100), "a"), (10L, ts(180), "b"), (20L, ts(151), "c"))
      .toDF("k", "ts", "v")
    val out = AsOfJoin(left, right, Seq("k"), "ts",
        struct(col("v").as("matched")))
      .orderBy("id").collect()
    assert(out.map(r => Option(r.getString(3))).toSeq ==
      Seq(Some("a"), Some("b"), None)) // id=1 matches AT its own ts; id=3's only candidate is later
  }

  test("equal-ts right duplicates resolve to the max payload") {
    val left = Seq((1L, 5L, ts(100))).toDF("id", "k", "ts")
    val right = Seq((5L, ts(50), "x"), (5L, ts(50), "z"), (5L, ts(50), "y"))
      .toDF("k", "ts", "v")
    val out = AsOfJoin(left, right, Seq("k"), "ts", struct(col("v").as("m")))
    assert(out.collect().head.getString(3) == "z")
  }

  test("NULL ts: right NULL-ts rows never match; left NULL-ts rows get no payload (ADVICE r4)") {
    val left = Seq((1L, 5L, Some(ts(100))), (2L, 5L, None: Option[Timestamp]))
      .toDF("id", "k", "ts")
    val right = Seq((5L, None: Option[Timestamp], "ghost"), (5L, Some(ts(50)), "real"))
      .toDF("k", "ts", "v")
    val out = AsOfJoin(left, right, Seq("k"), "ts", struct(col("v").as("m")))
      .orderBy("id").collect()
    // unfixed, "ghost" sorted nulls-first and was carried into the
    // NULL-ts left row (and would win any no-earlier-match row)
    assert(Option(out(0).getString(3)).contains("real"))
    assert(out(1).isNullAt(3), "NULL-ts right row satisfied the as-of condition")
  }

  test("matches brute-force per-row scan on the events fixture") {
    val q = ExtQueriesFixture.asof(spark, sfDir)
    val ev = graft.model.Tables.events(spark, sfDir)
      .select("event_id", "user_id", "ts", "value", "event_type").collect()
    val clicks = ev.filter(_.getString(4) == "click")
      .map(r => (r.getLong(1), r.getTimestamp(2), r.getDouble(3)))
    val expected = ev.filter(_.getString(4) == "purchase").map { p =>
      val best = clicks.filter(c => c._1 == p.getLong(1) &&
          !c._2.after(p.getTimestamp(2)))
        .sortBy(_._2.getTime).lastOption
      p.getLong(0) -> best.map(_._3)
    }.toMap
    val got = q.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(5)) None else Some(r.getDouble(5))))
      .toMap
    assert(got.size == expected.size)
    assert(got == expected)
  }

  test("plan: one shuffle on the key, no cartesian/range join") {
    val plan = ExtQueriesFixture.asof(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  private object ExtQueriesFixture {
    def asof(s: org.apache.spark.sql.SparkSession, d: String) =
      graft.ExtQueries.asofJoin(s, d)
  }
}

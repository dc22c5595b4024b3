package graft.plan

import graft.SparkSpec
import graft.api.MetricViewCatalog
import java.sql.Date
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for window-measure semantics (SURVEY.md §5.4):
  * trailing-7d == brute force over the raw series; cumulative is
  * monotone for non-negative inputs; semiadditive last picks the value
  * at the max order value. Generators driven manually with fixed seeds
  * (scalatestplus is not in the offline cache). */
class WindowPlannerSpec extends SparkSpec {

  private def forAll[A](gen: Gen[A], minSuccessful: Int = 10)(body: A => Unit): Unit =
    (1 to minSuccessful).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i))
        .foreach(a => body(a))
    }

  import org.apache.spark.sql.functions._

  private val yaml =
    """version: 0.1
      |source: series
      |dimensions:
      |  - name: grp
      |    expr: grp
      |  - name: d
      |    expr: d
      |  - name: m
      |    expr: m
      |measures:
      |  - name: t7
      |    expr: sum(v)
      |    window:
      |      - order: d
      |        range: trailing 7 day
      |        semiadditive: last
      |  - name: cum
      |    expr: sum(v)
      |    window:
      |      - order: d
      |        range: cumulative
      |        semiadditive: last
      |  - name: avg_t7
      |    expr: avg(v)
      |    window:
      |      - order: d
      |        range: trailing 7 day
      |        semiadditive: last
      |""".stripMargin

  private def catalogFor(rows: Seq[(String, Int, Long)]): MetricViewCatalog = {
    import spark.implicits._
    val df = rows.toDF("grp", "day_offset", "v")
      .withColumn("d", date_add(lit(Date.valueOf("2020-01-01")), col("day_offset")))
      .withColumn("m", month(col("d")))
      .select("grp", "d", "m", "v")
    val cat = new MetricViewCatalog(spark, Map("series" -> df).apply _)
    cat.createOrReplace("mv_series", yaml)
    cat
  }

  private val genRows: Gen[List[(String, Int, Long)]] =
    Gen.nonEmptyListOf(for {
      g <- Gen.oneOf("a", "b")
      off <- Gen.choose(0, 40)
      v <- Gen.choose(-50L, 100L)
    } yield (g, off, v))

  test("trailing-7d at (grp, d) grain equals brute force") {
    forAll(genRows, 15) { rows =>
      val got = catalogFor(rows).get("mv_series")
        .query(Seq("grp", "d"), Seq("t7"))
        .collect().map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2)).toMap
      // brute force: per (grp, day), sum of v over [day-6, day] in the group
      val byGrpDay = rows.groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).sum)
      val expect = byGrpDay.keys.map { case (g, day) =>
        val sum7 = (day - 6 to day).flatMap(dd => byGrpDay.get((g, dd))).sum
        val date = Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusDays(day)).toString
        (g, date) -> sum7
      }.toMap
      assert(got == expect)
    }
  }

  test("cumulative is monotone non-decreasing for non-negative inputs") {
    forAll(genRows.map(_.map(r => r.copy(_3 = math.abs(r._3)))), 10) { rows =>
      val got = catalogFor(rows).get("mv_series")
        .query(Seq("grp", "d"), Seq("cum"))
        .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
      got.groupBy(_._1).foreach { case (_, g) =>
        val sorted = g.sortBy(_._2.toEpochDay).map(_._3).toSeq
        assert(sorted == sorted.sorted, s"not monotone: $sorted")
      }
    }
  }

  test("semiadditive last at coarse grain == value at max order value") {
    forAll(genRows, 15) { rows =>
      val mv = catalogFor(rows).get("mv_series")
      val fine = mv.query(Seq("grp", "m", "d"), Seq("cum"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getDate(2).toLocalDate, r.getLong(3)))
      val coarse = mv.query(Seq("grp", "m"), Seq("cum"))
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
      val expect = fine.groupBy(t => (t._1, t._2)).view
        .mapValues(g => g.maxBy(_._3.toEpochDay)._4).toMap
      assert(coarse == expect)
    }
  }

  test("global-window tripwire: uncollapsed base grain is rejected") {
    // the unpartitioned window path may only see order-grain input
    WindowPlanner.requireCollapsedForGlobalWindow(
      Seq("order_date"), "order_date", Nil) // collapsed: fine
    WindowPlanner.requireCollapsedForGlobalWindow(
      Seq("order_date", "order_year"), "order_date", Seq("order_year")) // YTD stack: fine
    assertThrows[IllegalArgumentException] {
      WindowPlanner.requireCollapsedForGlobalWindow(
        Seq("market_segment", "order_date"), "order_date", Nil) // fact-wide grain: trip
    }
  }

  test("decomposed avg over window equals exact avg of the frame") {
    val rows = Seq(("a", 0, 10L), ("a", 1, 20L), ("a", 3, 40L), ("a", 12, 7L))
    val got = catalogFor(rows).get("mv_series")
      .query(Seq("grp", "d"), Seq("avg_t7"))
      .collect().map(r => r.getDate(1).toString -> r.getDouble(2)).toMap
    assert(got("2020-01-01") == 10.0)
    assert(got("2020-01-02") == 15.0)    // (10+20)/2
    assert(got("2020-01-04") == 70.0 / 3) // (10+20+40)/3
    assert(got("2020-01-13") == 7.0)      // window slid past the first cluster
  }
}

package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

/** Bucketed co-location removes the join/agg shuffle — asserted on the
  * physical plan with broadcast disabled (a broadcast join would hide
  * the property this spec exists to gate). */
class BucketingSpec extends SparkSpec {

  private def withNoBroadcast[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // static plans for the exchange assertions (repo plan-gate
    // convention — an unexecuted AQE wrapper hides its exchanges)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("bucketed-bucketed equi-join plans no shuffle and matches the plain join") {
    val orders = Tables.orders(spark, sfDir)
    val customer = Tables.customer(spark, sfDir)
    Bucketing.writeBucketed(orders, "bk_orders", Seq("o_custkey"), 4,
      sortCols = Seq("o_custkey"))
    Bucketing.writeBucketed(customer, "bk_customer", Seq("c_custkey"), 4,
      sortCols = Seq("c_custkey"))
    withNoBroadcast {
      val bucketed = Bucketing.table(spark, "bk_orders")
        .join(Bucketing.table(spark, "bk_customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name"))
      assert(!Bucketing.hasShuffle(bucketed),
        "co-located join must reuse the bucket distribution:\n" +
          bucketed.queryExecution.executedPlan)
      val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name"))
      assert(bucketed.collect().map(_.toSeq).toSet ==
        plain.collect().map(_.toSeq).toSet)
      // the un-bucketed join DOES shuffle under the same configs — the
      // gate is meaningful, not vacuous
      assert(Bucketing.hasShuffle(plain))
    }
  }

  test("partitioned layout: a partition-column predicate prunes at the scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val path = "/root/repo/target/part_orders"
    val orders = Tables.orders(spark, sfDir)
      .withColumn("order_year", year(to_date(col("o_orderdate"))))
    Bucketing.writePartitioned(orders, path, Seq("order_year"))
    withNoBroadcast { // static plan for the scan assertion
      val pruned = spark.read.parquet(path).filter(col("order_year") === 1995)
      val scan = pruned.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }.head
      assert(scan.partitionFilters.nonEmpty,
        "partition predicate must reach the scan as a PartitionFilter:\n" + scan)
      // and it actually selects ONE directory of several, not a
      // post-scan filter over everything
      val years = orders.select("order_year").distinct().count()
      assert(years > 1, "fixture must span multiple years")
      val selected = scan.relation.location.listFiles(scan.partitionFilters, Nil)
      assert(selected.size == 1,
        s"expected 1 pruned partition of $years, got ${selected.size}")
      assert(pruned.count() ==
        orders.filter(col("order_year") === 1995).count())
    }
  }

  test("aggregation on the bucket key plans no shuffle") {
    withNoBroadcast {
      val agg = Bucketing.table(spark, "bk_orders")
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      assert(!Bucketing.hasShuffle(agg),
        "bucket-keyed aggregate must be exchange-free:\n" +
          agg.queryExecution.executedPlan)
      val expected = Tables.orders(spark, sfDir)
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      assert(agg.collect().map(_.toSeq).toSet ==
        expected.collect().map(_.toSeq).toSet)
    }
  }

  test("path-escaping table names are rejected before any delete (ADVICE r7)") {
    val df = Tables.orders(spark, sfDir).limit(1)
    Seq("../evil", "a/b", "a\\b", "x..y", "").foreach { bad =>
      intercept[IllegalArgumentException] {
        Bucketing.writeBucketed(df, bad, Seq("o_custkey"), 2)
      }
    }
  }
}

package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture table loaders (TESTDATA.md / FIXTURES.md).
  *
  * Each table is a single parquet file under the scale-factor dir. At
  * cluster scale these would be partitioned/bucketed catalog tables; the
  * loader is the only place that would change — everything downstream is
  * plain lazy DataFrames, so predicate pushdown / column pruning reach
  * the scan regardless of how the table is stored.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")

  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")

  /** events.ts arrives in whatever physical type the fixture generator
    * used — TIMESTAMP(NANOS) (read as long via
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set by our session
    * builders) or, since the r9 fixtures, TIMESTAMP(MICROS) without a
    * timezone (read as TIMESTAMP_NTZ). Both normalize to TIMESTAMP:
    * watermarks and `unix_micros` require an instant type, and the
    * session timezone is pinned UTC so the NTZ→instant cast is the
    * identity on wall-clock values — exactly DuckDB's naive read. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer `div`, NOT `/`: epoch-nanos exceed double's 2^53
        // mantissa, so fractional division drifts by ±1µs
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}

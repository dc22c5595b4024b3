package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs. sf0.001 keeps unit tests fast; the
  * driver's DuckDB-oracle gate runs the same queries at sf0.01. */
abstract class SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  val sfDir = "/root/testdata/sf0.001"
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.sqlext.GraftExtensions")
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      // local-mode knob (see Bench): explicit-file reads above 32 root
      // paths otherwise spawn a distributed listing job per read
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "8192")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

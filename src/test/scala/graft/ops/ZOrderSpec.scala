package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave: hand-checked Morton codes") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L))
      .toDF("a", "b")
    val got = df.select(ZOrder.interleave(Seq(col("a"), col("b")), 3).as("z"))
      .as[Long].collect().toSeq
    // bit j of a -> position 2j; bit j of b -> position 2j+1
    // (3,5) = a:011, b:101 -> z bits: 100111 = 39
    assert(got == Seq(0L, 1L, 2L, 3L, 39L))
  }

  test("z-ordered write: content identical, files tight on BOTH dims") {
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "ts", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    ZOrder.writeZOrdered(ev, s"$dir/z", Seq("user_id", "ts"), files = 16)
    ev.repartition(16).write.parquet(s"$dir/plain")

    val z = spark.read.parquet(s"$dir/z")
    assert(z.collect().map(_.toString).sorted.toSeq ==
      ev.collect().map(_.toString).sorted.toSeq, "layout must not change content")

    // per-file extents: what parquet min/max stats would serve. A
    // z-ordered file must cover a small fraction of BOTH domains; a
    // hash-partitioned file covers ~all of each.
    def meanCoverage(dir: String): (Double, Double) = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      assert(files.length > 4, s"want several files, got ${files.length}")
      val globals = ev.agg(
        min("user_id"), max("user_id"),
        min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
      val uSpan = (globals.getLong(1) - globals.getLong(0)).toDouble
      val tSpan = (globals.getLong(3) - globals.getLong(2)).toDouble
      val cov = files.map { f =>
        val r = spark.read.parquet(f).agg(
          min("user_id"), max("user_id"),
          min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
        ((r.getLong(1) - r.getLong(0)) / uSpan,
         (r.getLong(3) - r.getLong(2)) / tSpan)
      }
      (cov.map(_._1).sum / cov.length, cov.map(_._2).sum / cov.length)
    }
    val (zu, zt) = meanCoverage(s"$dir/z")
    val (pu, pt) = meanCoverage(s"$dir/plain")
    assert(pu > 0.9 && pt > 0.9,
      s"hash-partitioned files should span ~the whole domain: $pu $pt")
    assert(zu + zt < (pu + pt) / 2.0,
      s"z-ordered files must be far tighter: z=($zu, $zt) plain=($pu, $pt)")
    assert(zu < 0.65 && zt < 0.65,
      s"each dimension individually tighter: ($zu, $zt)")
  }

  test("single z-column degenerates to a plain range sort; guards") {
    val df = Seq((1L, 10L), (2L, 5L), (3L, 20L)).toDF("id", "v")
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder1").toString
    ZOrder.writeZOrdered(df, s"$dir/s", Seq("v"), files = 2)
    assert(spark.read.parquet(s"$dir/s").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L))
    intercept[IllegalArgumentException] {
      ZOrder.writeZOrdered(df.withColumn("d", lit(1.5)), s"$dir/t", Seq("d"))
    }
    intercept[IllegalArgumentException] {
      ZOrder.interleave(Seq(col("a"), col("b"), col("c")), 21)
    }
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Shared file-level machinery for bucket-partitioned tables inside a
  * [[SnapshotRoot]] version directory — extracted from IncrementalSpans
  * (r11) so every append-only incremental store commits the same way:
  *
  *  - [[append]]: next snapshot hard-links every existing file and
  *    MOVES the delta's part files into the bucket dirs — O(delta)
  *    bytes written; buckets whose file count passes `compactAt` are
  *    rolled up (caller-supplied `compact`, e.g. summing df partials)
  *    in one extra partitioned write, keeping file counts bounded
  *    under continuous folding;
  *  - [[rewrite]]: delete+insert semantics for tables whose touched
  *    buckets must be REPLACED (old rows go away); untouched buckets
  *    hard-link.
  *
  * Both stage under `_`-prefixed dirs inside the NEXT version dir, so
  * a crash anywhere leaves the current snapshot untouched (the caller
  * flips the pointer last — the SnapshotRoot contract). */
private[ops] object BucketStore {

  private def bucketOf(f: java.io.File): Int = f.getName.split("=")(1).toInt
  private def dirs(path: String): Array[java.io.File] =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.contains("="))
  private def dataFiles(dir: java.io.File): Array[java.io.File] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))

  def append(spark: SparkSession, cur: String, nextDir: String,
      table: String, bucketCol: String, deltaRows: DataFrame,
      compact: DataFrame => DataFrame, schema: StructType,
      compactAt: Int = 16): Unit = {
    val stage = s"$nextDir/_stage_$table"
    deltaRows.repartition(col(bucketCol))
      .write.partitionBy(bucketCol).parquet(stage)
    val tdir = new java.io.File(s"$nextDir/$table")
    java.nio.file.Files.createDirectories(tdir.toPath)
    val curDirs = dirs(s"$cur/$table").map(f => bucketOf(f) -> f).toMap
    val stageDirs = dirs(stage).map(f => bucketOf(f) -> f).toMap
    val oversized = (curDirs.keySet ++ stageDirs.keySet).filter { b =>
      curDirs.get(b).map(dataFiles(_).length).getOrElse(0) +
        stageDirs.get(b).map(dataFiles(_).length).getOrElse(0) > compactAt
    }
    curDirs.foreach { case (b, cd) =>
      if (!oversized(b))
        SnapshotRoot.linkDirInto(cd, new java.io.File(tdir, cd.getName))
    }
    stageDirs.foreach { case (b, sd) =>
      if (!oversized(b)) {
        val dst = new java.io.File(tdir, sd.getName)
        java.nio.file.Files.createDirectories(dst.toPath)
        dataFiles(sd).foreach { f => // spark part names are unique across writes
          java.nio.file.Files.move(f.toPath, dst.toPath.resolve(f.getName))
        }
      }
    }
    if (oversized.nonEmpty) {
      val ov = oversized.toSeq.sorted.map(Integer.valueOf)
      val rows = spark.read.schema(schema).parquet(s"$cur/$table")
        .filter(col(bucketCol).isin(ov: _*))
        .unionByName(spark.read.schema(schema).parquet(stage)
          .filter(col(bucketCol).isin(ov: _*)))
      val stage2 = s"$nextDir/_compact_$table"
      compact(rows).repartition(col(bucketCol))
        .write.partitionBy(bucketCol).parquet(stage2)
      oversized.foreach { b =>
        val src = new java.io.File(s"$stage2/$bucketCol=$b")
        val dst = new java.io.File(tdir, s"$bucketCol=$b")
        if (src.isDirectory) require(src.renameTo(dst), s"rename failed: $src")
        else java.nio.file.Files.createDirectories(dst.toPath)
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stage2))
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stage))
  }

  def rewrite(cur: String, nextDir: String, table: String,
      bucketCol: String, touched: Seq[Int], rows: DataFrame): Unit = {
    val stage = s"$nextDir/_stage_$table"
    rows.repartition(col(bucketCol))
      .write.partitionBy(bucketCol).parquet(stage)
    val tdir = new java.io.File(s"$nextDir/$table")
    java.nio.file.Files.createDirectories(tdir.toPath)
    touched.foreach { b =>
      val src = new java.io.File(s"$stage/$bucketCol=$b")
      val dst = new java.io.File(tdir, s"$bucketCol=$b")
      if (src.isDirectory) {
        require(src.renameTo(dst), s"rename failed: $src -> $dst")
      } else java.nio.file.Files.createDirectories(dst.toPath)
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stage))
    dirs(s"$cur/$table")
      .filter(f => !touched.contains(bucketOf(f)))
      .foreach(srcF => SnapshotRoot.linkDirInto(srcF,
        new java.io.File(tdir, srcF.getName)))
  }
}

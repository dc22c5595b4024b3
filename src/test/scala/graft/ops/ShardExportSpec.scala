package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

/** Deterministic shuffle + shard export: assignment and order depend
  * only on (id, salt, N) — never on partitioning or scheduling — and
  * the written artifact is byte-stable across reruns. */
class ShardExportSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sfDir)

  test("assignment is partitioning-independent and salt-sensitive") {
    val a = ShardExport.assign(docs, nShards = 16, salt = 7L)
      .select("doc_id", "shard", "sort_key").collect().map(_.toSeq).toSet
    val b = ShardExport.assign(docs.repartition(13), nShards = 16, salt = 7L)
      .select("doc_id", "shard", "sort_key").collect().map(_.toSeq).toSet
    assert(a == b, "input partitioning changed the permutation")
    val c = ShardExport.assign(docs, nShards = 16, salt = 8L)
      .select("doc_id", "shard", "sort_key").collect().map(_.toSeq).toSet
    assert(a != c, "salt is inert")
  }

  test("shards are balanced and the shuffle decorrelates id order") {
    val counts = ShardExport.summary(docs, nShards = 16, salt = 7L)
      .select("shard", "n_docs").collect().map(r => r.getInt(0) -> r.getLong(1))
    assert(counts.length == 16, s"empty shards: only ${counts.length}")
    val ns = counts.map(_._2)
    assert(ns.max < 2 * ns.min,
      s"unbalanced shards: min ${ns.min}, max ${ns.max}")
    // decorrelation: within a shard, consecutive sort_key order must
    // not be id order (a broken key that preserves id order would
    // still pass balance)
    val shard0 = ShardExport.assign(docs, nShards = 16, salt = 7L)
      .filter(col("shard") === 0).orderBy("sort_key")
      .select("doc_id").collect().map(_.getLong(0))
    assert(shard0.length > 10)
    assert(!(shard0 sameElements shard0.sorted), "export order == id order")
  }

  test("written export is byte-stable across reruns and one sorted file per shard") {
    val base = java.nio.file.Files.createTempDirectory("graft-shard").toString
    ShardExport.write(docs, s"$base/run1", nShards = 8, salt = 7L)
    // second run from a differently-partitioned input
    ShardExport.write(docs.repartition(29), s"$base/run2", nShards = 8, salt = 7L)
    def files(p: String): Map[String, String] =
      org.apache.commons.io.FileUtils.listFiles(new java.io.File(p), Array("parquet"), true)
        .toArray.map(_.asInstanceOf[java.io.File])
        .map { f =>
          val rel = f.getAbsolutePath.stripPrefix(p)
          val md = java.security.MessageDigest.getInstance("MD5")
          rel.replaceAll("part-[^/]*", "part") ->
            md.digest(java.nio.file.Files.readAllBytes(f.toPath))
              .map("%02x".format(_)).mkString
        }.toMap
    val (f1, f2) = (files(s"$base/run1"), files(s"$base/run2"))
    assert(f1.keySet == f2.keySet && f1.keySet.size == 8,
      s"expected 8 one-file shard dirs, got ${f1.keySet} / ${f2.keySet}")
    f1.foreach { case (k, h) =>
      assert(f2(k) == h, s"shard file $k not byte-stable across reruns")
    }
    // rows inside each shard file are sorted by the permutation key
    (0 until 8).foreach { sh =>
      val keys = spark.read.parquet(s"$base/run1/shard=$sh")
        .select("sort_key").collect().map(_.getLong(0))
      assert(keys.sameElements(keys.sorted), s"shard $sh not key-sorted")
    }
  }

  test("filesPerShard splits a shard order-stably for bounded file sizes") {
    val base = java.nio.file.Files.createTempDirectory("graft-shard-split").toString
    ShardExport.write(docs, s"$base/split", nShards = 4, salt = 7L, filesPerShard = 3)
    val dirs = new java.io.File(s"$base/split").listFiles()
      .filter(_.getName.startsWith("shard="))
    assert(dirs.length == 4)
    dirs.foreach { d =>
      // each key-split level is its own nested dir with exactly one
      // deterministic file
      val sub = d.listFiles().filter(_.getName.startsWith("file_in_shard="))
      assert(sub.length == 3, s"${d.getName}: expected 3 splits, got ${sub.length}")
      sub.foreach { s =>
        assert(s.listFiles().count(_.getName.endsWith(".parquet")) == 1)
      }
    }
    // same rows as the single-file layout, shard by shard
    val single = ShardExport.assign(docs, nShards = 4, salt = 7L)
      .select("doc_id", "shard").collect().map(_.toSeq).toSet
    val split = spark.read.parquet(s"$base/split")
      .select("doc_id", "shard").collect().map(_.toSeq).toSet
    assert(split == single)
  }
}

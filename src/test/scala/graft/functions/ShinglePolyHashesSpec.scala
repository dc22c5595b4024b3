package graft.functions

import graft.SparkSpec
import graft.model.Tables
import graft.ops.{MinHashLSH, TextOps}
import org.apache.spark.sql.functions._

class ShinglePolyHashesSpec extends SparkSpec {

  /** The HOF chain this expression replaces (distinct shingle strings →
    * PolyHash61 → pmod into the prime field). */
  private def hofHashes(toks: org.apache.spark.sql.Column) =
    MinHashLSH.baseHashes(MinHashLSH.shinglesFromTokens(toks, 3))

  test("hash SET and k-min signature match the HOF chain, both codegen paths") {
    Seq("true", "false").foreach { codegen =>
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try {
        val rows = Tables.documents(spark, sfDir).limit(200)
          .withColumn("__toks", TextOps.tokens(lower(col("text"))))
          .filter(size(col("__toks")) >= 3)
          .withColumn("native", ShinglePolyHashes(col("__toks"), 3))
          .withColumn("hof", hofHashes(col("__toks")))
          .withColumn("sig_native", MinHashSignature(col("native"), 64, 42L))
          .withColumn("sig_hof", MinHashSignature(col("hof"), 64, 42L))
          .select("doc_id", "native", "hof", "sig_native", "sig_hof")
          .collect()
        assert(rows.nonEmpty)
        rows.foreach { r =>
          // duplicates are kept by the native path, so compare SETS —
          // and the signatures (min per family) must be identical
          assert(r.getSeq[Long](1).toSet == r.getSeq[Long](2).toSet,
            s"doc ${r.getLong(0)} hash set mismatch (codegen=$codegen)")
          assert(r.getSeq[Long](3) == r.getSeq[Long](4),
            s"doc ${r.getLong(0)} signature mismatch (codegen=$codegen)")
        }
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("salted fold == hashing 'salt + \" \" + shingle' (the saltState contract)") {
    import spark.implicits._
    val salt = "s3cr3t-run"
    val s0 = PolyHash61.compute((salt + " ").getBytes("UTF-8"))
    // HOF form of the salted contract: PolyHash61 of the CONCATENATED
    // string, folded into the same prime field
    val saltedHof = (toks: org.apache.spark.sql.Column) =>
      transform(MinHashLSH.shinglesFromTokens(toks, 3),
        s => pmod(PolyHash61(concat(lit(salt + " "), s)), lit(2147483647L)))
    Seq("true", "false").foreach { codegen =>
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try {
        val rows = Tables.documents(spark, sfDir).limit(100)
          .withColumn("__toks", TextOps.tokens(lower(col("text"))))
          .filter(size(col("__toks")) >= 3)
          .withColumn("native", ShinglePolyHashes(col("__toks"), 3, s0))
          .withColumn("hof", saltedHof(col("__toks")))
          .withColumn("unsalted", ShinglePolyHashes(col("__toks"), 3))
          .collect()
        assert(rows.nonEmpty)
        rows.foreach { r =>
          assert(r.getSeq[Long](r.fieldIndex("native")).toSet ==
            r.getSeq[Long](r.fieldIndex("hof")).toSet,
            s"salted hash mismatch (codegen=$codegen)")
          assert(r.getSeq[Long](r.fieldIndex("native")).toSet !=
            r.getSeq[Long](r.fieldIndex("unsalted")).toSet,
            "salt must actually change the hashes")
        }
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("edge cases: short docs yield no hashes; duplicate shingles keep the min") {
    import spark.implicits._
    val byId = Seq(
      (1L, "a b"),                 // < w tokens -> empty
      (2L, "a b c"),               // exactly one shingle
      (3L, "x y x y x y x y"),     // duplicate shingles
      (4L, "one two three four")   // two shingles
    ).toDF("id", "text")
      .withColumn("__toks", TextOps.tokens(lower(col("text"))))
      .withColumn("native", ShinglePolyHashes(col("__toks"), 3))
      .withColumn("hof", hofHashes(col("__toks")))
      .collect()
      .map(r => r.getLong(0) -> (r.getSeq[Long](3).toSet, r.getSeq[Long](4).toSet))
      .toMap
    assert(byId(1L)._1.isEmpty && byId(1L)._2.isEmpty)
    assert(byId(2L)._1.size == 1 && byId(2L)._1 == byId(2L)._2)
    assert(byId(3L)._1 == byId(3L)._2)
    assert(byId(4L)._1.size == 2 && byId(4L)._1 == byId(4L)._2)
  }
}

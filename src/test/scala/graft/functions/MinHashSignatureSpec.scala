package graft.functions

import graft.SparkSpec
import graft.model.Tables
import graft.ops.{MinHashLSH, TextOps}
import org.apache.spark.sql.functions._

class MinHashSignatureSpec extends SparkSpec {

  private def withHashes = Tables.documents(spark, sfDir)
    .withColumn("__toks", TextOps.tokens(lower(col("text"))))
    .withColumn("__sh", MinHashLSH.shinglesFromTokens(col("__toks")))
    .withColumn("__hs", MinHashLSH.baseHashes(col("__sh")))

  test("codegen expression == interpreted HOF reference, both code paths") {
    Seq("true", "false").foreach { codegen =>
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try {
        val rows = withHashes
          .withColumn("native", MinHashSignature(col("__hs"), 32, 42L))
          .withColumn("hof", MinHashLSH.signatureFromHashes(col("__hs"), 32, 42L))
          .select("doc_id", "native", "hof")
          .collect()
        rows.foreach { r =>
          assert(r.getSeq[Long](1) == r.getSeq[Long](2),
            s"doc ${r.getLong(0)} mismatch (codegen=$codegen)")
        }
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("empty input yields the identity signature") {
    import spark.implicits._
    val got = Seq(Seq.empty[Long]).toDF("hs")
      .select(MinHashSignature(col("hs"), 8, 1L)).collect()(0).getSeq[Long](0)
    assert(got == Seq.fill(8)(Long.MaxValue))
  }

  test("signature estimates jaccard (property of minhash)") {
    import spark.implicits._
    val a = (1 to 200).map(_.toLong)
    val b = (101 to 300).map(_.toLong) // true J = 100/300 = 1/3
    val df = Seq(("a", a), ("b", b)).toDF("id", "hs")
      .select(col("id"), MinHashSignature(col("hs"), 256, 7L).as("sig"))
    val sigs = df.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val agree = sigs("a").zip(sigs("b")).count { case (x, y) => x == y } / 256.0
    assert(math.abs(agree - 1.0 / 3) < 0.1, s"estimated J=$agree, want ~0.333")
  }
}

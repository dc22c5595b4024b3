package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PolyHash61Spec extends SparkSpec {

  /** Exact-arithmetic reference: the fold DuckDB's HUGEINT computes
    * (minhashPairsCtes) — the expression's wraparound `& (2^61-1)`
    * must equal it on every input. */
  private def bigIntRef(s: String): Long =
    s.getBytes("UTF-8").foldLeft(BigInt(0)) { (h, b) =>
      (h * BigInt(PolyHash61.B) + BigInt(b & 0xff)) mod BigInt(PolyHash61.Modulus)
    }.toLong

  test("wraparound fold == exact BigInt fold, both codegen paths") {
    import spark.implicits._
    val inputs = Seq("", "a", "the quick brown fox", "0,123,456,789",
      "x" * 500, (0 until 128).map(_.toChar).mkString) // full byte range
    Seq("true", "false").foreach { codegen =>
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try {
        val got = inputs.toDF("s").select(PolyHash61(col("s"))).collect().map(_.getLong(0))
        inputs.zip(got).foreach { case (in, h) =>
          assert(h == bigIntRef(in), s"input ${in.take(30)} (codegen=$codegen)")
          assert(h >= 0L && h < PolyHash61.Modulus)
        }
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("blocked 4-byte fold == byte-at-a-time reference on random bytes") {
    // every length residue mod 4, lengths 0..67, plus long strings —
    // the blocked main loop and the scalar tail must splice exactly
    val rnd = new scala.util.Random(7)
    val cases = (0 to 67).map { n =>
      val b = new Array[Byte](n); rnd.nextBytes(b); b
    } ++ Seq(4096, 4097, 4098, 4099).map { n =>
      val b = new Array[Byte](n); rnd.nextBytes(b); b
    }
    cases.foreach { b =>
      assert(PolyHash61.compute(b) == PolyHash61.computeReference(b),
        s"length ${b.length}")
    }
  }

  test("null propagates, empty string hashes to 0") {
    import spark.implicits._
    val rows = Seq(Some(""), None).toDF("s")
      .select(PolyHash61(col("s"))).collect()
    assert(rows(0).getLong(0) == 0L)
    assert(rows(1).isNullAt(0))
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("langId identifies real multilingual samples") {
    val samples = Seq(
      ("the quick brown fox jumps over the lazy dog and it is fast", "en"),
      ("der schnelle braune fuchs springt und das ist nicht langsam mit ein", "de"),
      ("le renard brun saute et la vitesse est une chose pour les chiens", "fr"),
      ("el zorro marrón salta y es una cosa que los perros ven por la noche", "es"),
      ("敏捷的棕色狐狸跳过了懒狗", "zh"),
      ("zzz qqq xxx www", "und"))
    val got = samples.toDF("text", "expected")
      .withColumn("pred", TextOps.langId(col("text")))
      .collect().map(r => (r.getString(1), r.getString(2)))
    got.foreach { case (expected, pred) => assert(pred == expected, s"want $expected got $pred") }
  }

  test("charNgrams produces distinct ordered n-grams") {
    val got = Seq("abcab").toDF("text")
      .select(TextOps.charNgrams(col("text"), 3).as("g"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq("abc", "bca", "cab"))
  }

  test("quality score stays within [0,1] and favors clean text") {
    val df = Seq(
      "the system processes data in parallel and it is efficient for large tables",
      "!!!! ???? ,,,, 1234 5678 .... ;;;; 9999 !!!!").toDF("text")
    val scores = TextOps.textStats(df).select("quality_score").collect().map(_.getDouble(0))
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(0) > scores(1))
  }

  test("fingerprint is whitespace/case insensitive") {
    val fps = Seq("Hello   World", "hello world", "different")
      .toDF("text").select(TextOps.fingerprint(col("text"))).collect().map(_.getString(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("repetitionStats: ratios, adjacent runs, and flag thresholds") {
    val df = Seq(
      (1L, "a a a a a"),           // degenerate: all one word
      (2L, "a b c d e"),           // all distinct, no repeats
      (3L, "a b a b c c"))         // one adjacent repeat (c c)
      .toDF("doc_id", "text")
    val got = TextOps.repetitionStats(df).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getBoolean(5)))
    assert(got(0) == ((1L, 5L, 0.8, 1.0, 4L, true)))   // top ratio 1.0 flags
    assert(got(1) == ((2L, 5L, 0.0, 0.2, 0L, false)))  // 0.2 is not > 0.2
    assert(got(2) == ((3L, 6L, 0.5, 0.333333, 1L, true)))
  }

  test("exactDedup keeps min id and counts copies") {
    val df = Seq((1L, "aa bb"), (2L, "aa  bb"), (3L, "cc")).toDF("doc_id", "text")
    val got = TextOps.exactDedup(df).orderBy("keep_id")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("shared tokens carry provenance: wrong textCol is NOT substituted") {
    val df = Seq((1L, "Alpha Beta", "Title Words Here"))
      .toDF("doc_id", "text", "title")
    val shared = TextOps.withSharedTokens(df, "text")
    // matching column: the precomputed array is substituted
    val fromShared = shared.select(
      TextOps.tokensOf(shared, "text", lowered = true).as("t"))
      .head().getSeq[String](0)
    assert(fromShared == Seq("alpha", "beta"))
    // mismatched column (ADVICE r12): fall back to the inline split of
    // the REQUESTED column — never serve tokens of a different one
    val fromTitle = shared.select(
      TextOps.tokensOf(shared, "title", lowered = true).as("t"))
      .head().getSeq[String](0)
    assert(fromTitle == Seq("title", "words", "here"))
    // provenance survives the keepTokens projection + a filter
    val narrowed = TextOps.keepTokens(shared.filter(col("doc_id") > 0),
      "doc_id", "text")
    assert(TextOps.tokensOf(narrowed, "text").toString
      .contains(TextOps.TokCol))
  }
}

package graft.ops

import graft.SparkSpec

class BigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("scores match the hand formula on a tiny corpus") {
    // corpus: c(a,b)=3, c(a,c)=1 → hist(a)=4; c(b,a)=1, c(b,x)=1 →
    // hist(b)=2
    val docs = Seq(
      (1L, "s", "a b"),
      (2L, "s", "a c"),
      (3L, "s", "a b a b x"),
      (4L, "s", "lonely")).toDF("doc_id", "source", "text")
    val r = BigramLm.scores(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    // single-bigram docs score their bigram's lp exactly
    assert(r(1L).getAs[Double]("logp") == -0.287682) // ln(3/4)
    assert(r(2L).getAs[Double]("logp") == -1.386294) // ln(1/4)
    assert(r(1L).getAs[Long]("n_bigrams") == 1L)
    // doc 3: (2·ln(3/4) + ln(1/2) + ln(1/2)) / 4, exact decimal sum
    val d3 = r(3L).getAs[Double]("logp")
    assert(math.abs(d3 - (-0.490415)) < 2e-6)
    assert(r(3L).getAs[Long]("n_bigrams") == 4L)
    // atypical word order scores below typical (doc 2 < doc 3 < doc 1)
    assert(r(2L).getAs[Double]("logp") < d3 && d3 < r(1L).getAs[Double]("logp"))
    // a doc with < 2 tokens has no bigrams and is excluded
    assert(!r.contains(4L))
  }

  test("fixture corpus scores are total and finite") {
    val out = BigramLm.scores(
      graft.model.Tables.documents(spark, sfDir)).collect()
    assert(out.nonEmpty)
    out.foreach { x =>
      val lp = x.getAs[Double]("logp")
      assert(!lp.isNaN && !lp.isInfinite && lp <= 0.0)
    }
  }
}

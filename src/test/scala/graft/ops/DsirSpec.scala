package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("target-like raw docs outscore target-unlike ones") {
    // target model: fruit vocabulary; raw pool: one fruity doc, one not
    val docs = Seq(
      (1L, "t", "apple banana cherry apple banana"),
      (2L, "t", "banana cherry apple cherry"),
      (3L, "r", "apple banana cherry banana apple"),
      (4L, "r", "gravel cement asphalt concrete rebar")
    ).toDF("doc_id", "source", "text")
    val s = Dsir.scores(docs, targetPred = col("source") === "t",
        buckets = 256, carry = Seq("source"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(s.keySet == Set(3L, 4L), "only the raw pool is scored")
    assert(s(3L) > s(4L),
      s"fruity doc must look more target-like: ${s(3L)} vs ${s(4L)}")
  }

  test("hand formula on a one-bucket-per-feature corpus") {
    // single-token docs, large bucket count → grams land in distinct
    // buckets; verify one doc's weight against the closed form
    val docs = Seq(
      (1L, "t", "aa"), (2L, "t", "aa"), (3L, "t", "bb"),
      (4L, "r", "aa"), (5L, "r", "cc")
    ).toDF("doc_id", "source", "text")
    val b = 4096
    val s = Dsir.scores(docs, col("source") === "t", buckets = b)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // model: T=3 target feats (aa:2, bb:1), R=2 raw feats (aa:1, cc:1)
    def lw(tc: Long, rc: Long): Double =
      BigDecimal(math.log((tc + 1).toDouble / (3 + b)) -
        math.log((rc + 1).toDouble / (2 + b)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(s(4L) - lw(2, 1)) < 1e-9)
    assert(math.abs(s(5L) - lw(0, 1)) < 1e-9)
    assert(s(4L) > s(5L), "the target-attested gram must outweigh the novel one")
  }

  test("scores are partitioning-invariant (exact decimal contract)") {
    val docs = Tables.documents(spark, sfDir)
    def run(parts: Int) =
      Dsir.scores(docs.repartition(parts), col("lang") === "en")
        .collect().map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4)))
        .sortBy(_._1).toSeq
    assert(run(1) == run(7))
  }

  test("bigram features make word order matter") {
    val docs = Seq(
      (1L, "t", "red apple red apple red apple"),
      (2L, "r", "red apple red apple"),
      (3L, "r", "apple red apple red")
    ).toDF("doc_id", "source", "text")
    val s = Dsir.scores(docs, col("source") === "t", buckets = 65536)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(s(2L) > s(3L),
      "same bag of words, target-matching order must score higher")
  }

  test("guards: empty target refused; null predicate rows are raw") {
    val docs = Seq((1L, "r", "a b")).toDF("doc_id", "source", "text")
    intercept[IllegalArgumentException] {
      Dsir.scores(docs, col("source") === "t").collect()
    }
    val withNull = Seq((1L, "t", "a b"), (2L, null, "a b"))
      .toDF("doc_id", "source", "text")
    val out = Dsir.scores(withNull, col("source") === "t").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L),
      "null predicate row must fall into the raw pool, not vanish")
  }
}

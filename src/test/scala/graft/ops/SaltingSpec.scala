package graft.ops

import graft.SparkSpec
import graft.model.Models
import org.apache.spark.sql.functions._

class SaltingSpec extends SparkSpec {

  test("salted join == plain join on the order⟕customer fact join") {
    val fact = Models.stgOrders(spark, sfDir)
    val dim = Models.stgCustomers(spark, sfDir)
    val plainDf = fact.join(dim, Seq("customer_id"), "left")
    val plain = plainDf.collect().map(_.toSeq).toSet
    val got = Salting.skewJoin(fact, dim, "customer_id", n = 8,
        discriminators = Seq("order_id"))
      .select(plainDf.columns.map(col): _*)
      .collect().map(_.toSeq).toSet
    assert(got == plain)
  }

  test("salt is deterministic and within range") {
    import spark.implicits._
    val df = (1 to 1000).toDF("x")
    val s1 = df.select(Salting.salt(8, col("x"))).collect().map(_.getInt(0))
    val s2 = df.select(Salting.salt(8, col("x"))).collect().map(_.getInt(0))
    assert(s1.toSeq == s2.toSeq)
    assert(s1.forall(v => v >= 0 && v < 8))
    // spreads: every salt bucket used
    assert(s1.distinct.length == 8)
  }

  test("inner salted join also matches") {
    val fact = Models.stgOrders(spark, sfDir)
    val dim = Models.stgCustomers(spark, sfDir)
    val cols = fact.join(dim, Seq("customer_id")).columns
    val plain = fact.join(dim, Seq("customer_id")).select(cols.map(col): _*)
      .collect().map(_.toSeq).toSet
    val got = Salting.skewJoin(fact, dim, "customer_id", joinType = "inner")
      .select(cols.map(col): _*).collect().map(_.toSeq).toSet
    assert(got == plain)
  }
}

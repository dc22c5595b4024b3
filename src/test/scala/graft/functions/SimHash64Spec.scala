package graft.functions

import graft.SparkSpec
import graft.model.Tables
import graft.ops.SimHash
import org.apache.spark.sql.functions._

class SimHash64Spec extends SparkSpec {

  test("codegen expression == interpreted HOF reference, both code paths") {
    Seq("true", "false").foreach { codegen =>
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try {
        val rows = Tables.documents(spark, sfDir).limit(100)
          .withColumn("native", SimHash.simhash(col("text")))
          .withColumn("hof", SimHash.simhashHof(col("text")))
          .select("doc_id", "native", "hof").collect()
        rows.foreach(r => assert(r.getLong(1) == r.getLong(2),
          s"doc ${r.getLong(0)} mismatch (codegen=$codegen)"))
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("identical token multisets give identical simhash; disjoint differ") {
    import spark.implicits._
    val df = Seq("spark table join", "table spark join", "zzz qqq www")
      .toDF("text").select(SimHash.simhash(col("text")).as("h"))
    val hs = df.collect().map(_.getLong(0))
    assert(hs(0) == hs(1))
    assert(hs(0) != hs(2))
  }
}

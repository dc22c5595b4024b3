package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` Spark internals that every serious
  * Spark extension library needs: Catalyst Expression → public Column
  * (Spark 4 ColumnNode world) and LogicalPlan → DataFrame. Kept to two
  * one-liners so the internal surface we depend on is explicit.
  */
object GraftBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[classic.SparkSession].expression(c)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].logicalPlan

  /** Truncate lineage: re-root `df` as a flat `LogicalRDD` over its
    * (lazy) internal-row RDD. Iterative algorithms whose round-n plan
    * references round n−1 twice (e.g. label propagation's
    * join-then-merge) otherwise build 2^rounds-node logical trees —
    * tree-copying transforms turn the shared-subplan DAG into an
    * exponential tree and the driver dies in analysis, not execution.
    * The RDD still reads the source's cache when computed; nothing is
    * materialized here. */
  def flatten(df: DataFrame): DataFrame = {
    val cds = df.asInstanceOf[classic.Dataset[Row]]
    cds.sparkSession.internalCreateDataFrame(
      cds.queryExecution.toRdd, cds.schema)
  }

  /** DataFrame over an internal-row RDD — the return path for the rare
    * per-partition imperative operator (e.g. whole-doc packing's
    * stateful scan) whose rows were produced by `queryExecution.toRdd`
    * and therefore already carry internal types. */
  def internalDF(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)
}

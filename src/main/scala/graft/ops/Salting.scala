package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed equi-joins.
  *
  * AQE's skew-join handling (on by default) splits oversized partitions
  * at runtime, but only for sort-merge joins and only per-partition;
  * when one fact key is pathologically hot (the classic null-key /
  * power-law customer), explicit salting is still the reliable tool:
  * fact rows get a deterministic salt in [0, n), the dim side is
  * replicated n× with every salt value, and the join key becomes
  * (key, salt) — spreading the hot key over n reducers.
  *
  * The salt must be deterministic (NOT rand()) or retried/speculated
  * tasks produce different rows: derived here by hashing a
  * caller-chosen discriminator column set.
  */
object Salting {

  /** Deterministic salt in [0, n) from discriminator columns. */
  def salt(n: Int, discriminators: Column*): Column =
    pmod(hash(discriminators: _*), lit(n))

  /** Skew-resistant left equi-join of fact ⋈ dim on `key`:
    * semantically identical to `fact.join(dim, key, "left")` for
    * dim-unique keys (asserted in SaltingSpec). */
  def skewJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      n: Int = 8,
      joinType: String = "left",
      discriminators: Seq[String] = Nil): DataFrame = {
    val disc =
      if (discriminators.nonEmpty) discriminators.map(fact(_))
      else fact.columns.map(fact(_)).toSeq
    val saltedFact = fact.withColumn("__salt", salt(n, disc: _*))
    // dim side replicated n× — one row per salt value
    val saltedDim = dim.withColumn("__salt", explode(sequence(lit(0), lit(n - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash (Charikar) 64-bit document fingerprints + hamming-banded
  * near-dup pairing.
  *
  * Fingerprint: per token-hash, each of the 64 bits votes ±1; the sign
  * of each accumulated bit becomes the fingerprint bit. Computed with
  * per-row higher-order functions — no shuffle, no UDF.
  *
  * The per-token hash is the engine-owned [[graft.functions.PolyHash61]]
  * (since r7; previously xxhash64), so the whole fingerprint is
  * re-derivable in the DuckDB oracle (ExtQueries.simhashSql — the same
  * swap that fully oracled the minhash pipeline in r6). PolyHash61 is
  * 61-bit, so fingerprint bits 61-63 always vote negative and are
  * structurally 0: a 61-effective-bit simhash, which leaves the
  * hamming-similarity contract intact (DedupSpec gates).
  *
  * Pairing: near-dups (hamming ≤ d) must share at least one of d+1
  * equal bit-blocks (pigeonhole), so docs are bucketed by each of 4
  * BIT-AWARE blocks over the 61 live bits — 16/15/15/15 at offsets
  * 0/16/31/46 (ADVICE r7: a naive 4×16 split left block 3 with only
  * 13 live bits, ~8× the bucket collision mass of the other blocks on
  * large corpora) — one shuffle on (block idx, block value), then
  * verified with exact `bit_count(a XOR b)`. The pigeonhole argument
  * only needs the blocks to be disjoint and to cover every bit that
  * can differ, which the 61-bit cover does.
  */
object SimHash {

  /** Production path: native codegen'd expression over token hashes.
    * `salt` (r9, VERDICT r8 task 7): a per-run secret re-keys every
    * token hash via the [[MinHashLSH.saltState]] fold contract
    * (hashing `salt + " " + token`), denying the closed-form
    * PolyHash61 collision construction that would let an adversary
    * steer fingerprint bits. Identical tokens hash identically under
    * the same salt, so near-dup recall is unchanged (DedupSpec).
    * "" = the unsalted, oracle-able default. */
  def simhash(text: Column, salt: String = ""): Column =
    graft.functions.SimHash64(
      transform(TextOps.tokens(lower(text)),
        t => graft.functions.PolyHash61(t, MinHashLSH.saltState(salt))))

  /** Reference HOF implementation — the semantic spec the native
    * expression is asserted against (SimHash64Spec); interpreted and
    * allocating a 64-slot array per token, so not used on hot paths. */
  def simhashHof(text: Column): Column = {
    val hs = transform(TextOps.tokens(lower(text)), t => graft.functions.PolyHash61(t))
    val votes = aggregate(hs, array_repeat(lit(0), 64),
      (acc: Column, h: Column) => zip_with(acc, sequence(lit(0), lit(63)),
        (v: Column, b: Column) =>
          v + when(call_function("shiftright", h, b).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)))
    aggregate(zip_with(votes, sequence(lit(0), lit(63)),
      (v: Column, b: Column) => when(v > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc: Column, x: Column) => acc.bitwiseOR(x))
  }

  def fingerprints(df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      salt: String = ""): DataFrame =
    df.select(col(idCol).as("doc_id"), simhash(col(textCol), salt).as("simhash"))

  /** Pairs with hamming distance ≤ maxHamming (needs maxHamming ≤ 3
    * for the 4-block pigeonhole to be complete). */
  def nearDuplicates(df: DataFrame, maxHamming: Int = 3,
      textCol: String = "text", idCol: String = "doc_id",
      salt: String = ""): DataFrame = {
    require(maxHamming <= 3, "4-block banding guarantees recall only for hamming <= 3")
    // persisted: the block self-join reads it on both sides (see
    // MinHashLSH.candidatePairs)
    val fp = Persists.cache(fingerprints(df, textCol, idCol, salt))
    // bit-aware 16/15/15/15 blocks over the 61 live bits (see scaladoc)
    val blockDefs = Seq((0, 16), (16, 15), (31, 15), (46, 15))
    val blocked = fp.select(col("doc_id"), col("simhash"),
      posexplode(array(blockDefs.map { case (off, width) =>
        call_function("shiftright", col("simhash"), lit(off))
          .bitwiseAND(lit((1L << width) - 1L))
      }: _*)).as(Seq("block", "block_val")))
    val a = blocked.select(col("block"), col("block_val"),
      col("doc_id").as("a_id"), col("simhash").as("a_hash"))
    val b = blocked.select(col("block"), col("block_val"),
      col("doc_id").as("b_id"), col("simhash").as("b_hash"))
    a.join(b, Seq("block", "block_val"))
      .filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming", bit_count(col("a_hash").bitwiseXOR(col("b_hash"))))
      .filter(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
  }
}

package graft

import graft.model.Tables
import org.apache.spark.sql.functions._

/** Fixture invariants the oracle SQL depends on — fail loudly when the
  * driver-generated parquet changes shape (ADVICE r3).
  *
  * multimodalDecodeSql (ExtQueries) recomputes the stub codec's Java
  * `Arrays.hashCode` fold over UTF-8 *bytes* with DuckDB `ord()` *code
  * points* — identical only while every documents.text is pure ASCII.
  * If the fixture ever gains non-ASCII rows (e.g. real CJK text for the
  * zh langId path), the oracle silently diverges; this spec turns that
  * into a loud failure at the fixture, not a mystery hash mismatch.
  */
class FixtureSpec extends SparkSpec {

  private val checkedDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .filter(d => new java.io.File(d).isDirectory)

  checkedDirs.foreach { dir =>
    test(s"documents.text is pure ASCII at $dir (multimodal oracle ord()==byte assumption)") {
      val nonAscii = Tables.documents(spark, dir)
        .filter(col("text").rlike("[^\\x00-\\x7F]"))
        .select("doc_id")
      val offenders = nonAscii.limit(5).collect().map(_.get(0)).mkString(", ")
      assert(offenders.isEmpty,
        s"documents fixture at $dir has non-ASCII text (doc_ids: $offenders) — " +
          "multimodalDecodeSql's ord()-as-byte oracle no longer matches the UTF-8 " +
          "byte fold; rewrite the oracle over encode(text) bytes before trusting it")
    }
  }
}

package graft.mat

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Versioned parquet table with an atomically-flipped current-version
  * pointer — the engine's stand-in for a transactional table format
  * (which is what a 100 TB deployment would use for its rollup/baseline
  * caches).
  *
  * Layout: `<dir>/v<N>/` complete parquet snapshots plus `<dir>/_current`
  * containing the live version name. A writer materializes the NEXT
  * version directory in full and only then flips `_current` with an
  * atomic rename, so:
  *
  *  - a reader that resolved the pointer before the flip keeps reading
  *    the previous, complete snapshot — the reference's `mode: relaxed`
  *    stale-read-during-refresh contract
  *    (/root/reference/models/schema.yml:108, README.md:355-361);
  *  - no reader ever observes a half-written table (a plain
  *    `mode("overwrite")` deletes the directory before rewriting it —
  *    a concurrent scan mid-overwrite fails or returns partial rows).
  *
  * Old versions are garbage-collected on write, keeping one previous
  * snapshot for in-flight readers.
  */
object VersionedTable {

  private def pointer(dir: String): Path = Paths.get(dir, "_current")

  /** The live version name (e.g. "v3"), if the table exists. */
  def currentVersion(dir: String): Option[String] =
    if (Files.exists(pointer(dir)))
      Some(new String(Files.readAllBytes(pointer(dir))).trim)
    else None

  def exists(dir: String): Boolean = currentVersion(dir).isDefined

  /** Absolute path of the live snapshot. */
  def currentPath(dir: String): Option[String] =
    currentVersion(dir).map(v => s"$dir/$v")

  /** Read the live snapshot. The returned plan is pinned to the version
    * directory it resolved — a concurrent write + pointer flip does not
    * disturb it. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(currentPath(dir).getOrElse(
      sys.error(s"versioned table at $dir has no current version")))

  /** Write `df` as the next version and atomically flip the pointer. */
  def write(df: DataFrame, dir: String, extras: Map[String, String] = Map.empty): Unit = {
    Files.createDirectories(Paths.get(dir))
    val curN = currentVersion(dir).map(versionNumber).getOrElse(0L)
    val next = s"v${curN + 1}"
    df.write.mode("overwrite").parquet(s"$dir/$next")
    // caller metadata ("_"-prefixed, invisible to the parquet reader)
    // lands INSIDE the version dir before the flip — atomic with the
    // data, the DriftStore ledger pattern (e.g. applied-fold ledgers)
    extras.foreach { case (name, content) =>
      require(name.startsWith("_"), s"extra file '$name' must be _-prefixed")
      Files.write(Paths.get(dir, next, name), content.getBytes)
    }
    // snapshot stats, captured while the version is being produced: the
    // count-star re-read is answered from parquet footer metadata (no
    // row scan), and routing uses it to pick the CHEAPEST covering
    // rollup by actual size rather than by dimension count. Stored
    // inside the version dir ("_"-prefixed files are invisible to the
    // parquet reader), so stats flip atomically with the data.
    val rows = df.sparkSession.read.parquet(s"$dir/$next").count()
    Files.write(Paths.get(dir, next, "_rowcount"), rows.toString.getBytes)
    val tmp = Paths.get(dir, "_current.tmp")
    Files.write(tmp, next.getBytes)
    Files.move(tmp, pointer(dir),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    // GC: drop snapshots older than the one just superseded (that one
    // stays for readers that resolved the pointer before the flip)
    listVersions(dir).filter(versionNumber(_) < curN)
      .foreach(v => deleteRecursively(Paths.get(dir, v)))
  }

  /** Row count of the live snapshot, if its write recorded one (tables
    * written before stats existed simply report None — routing then
    * falls back to the dimension-count proxy). */
  def rowCount(dir: String): Option[Long] =
    currentPath(dir).map(p => Paths.get(p, "_rowcount")).filter(Files.exists(_))
      .map(p => new String(Files.readAllBytes(p)).trim.toLong)

  /** Remove the table entirely (spec invalidation). */
  def destroy(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p)) deleteRecursively(p)
  }

  private def versionNumber(v: String): Long = v.drop(1).toLong

  private def listVersions(dir: String): Seq[String] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) Nil
    else Files.list(p).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.matches("v\\d+")).toSeq
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.toSeq.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}

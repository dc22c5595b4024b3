package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Persisted ANN index artifacts (VERDICT r7 residual #3): at corpus
  * scale, index training is an OFFLINE job whose output persists and
  * is loaded by every query session — like the metric-view catalog's
  * YAML files, not a per-session retrain. A 100 TB deployment trains
  * the IVF centroids (or fixes the LSH plane tensor) once on a sample,
  * stores the artifact next to the data, and every reader session
  * loads it; retraining per session would both waste the sample scan
  * and silently produce a DIFFERENT partition of the corpus (k-means
  * is seed- and sample-dependent), invalidating any cell-partitioned
  * layout written against the old model.
  *
  * Format: plain text, one `Double.toString` per value. Java's
  * shortest-round-trip rule guarantees `parseDouble(toString(d)) == d`
  * bit-for-bit, so a loaded model is IDENTICAL to the trained one and
  * every downstream plan (cell assignment, probe order, the DuckDB
  * oracle's embedded literals) is unchanged — gated in IndexStoreSpec.
  * No JSON/serialization dependency, human-diffable, and the header
  * (shape line) makes shape drift fail loudly at load.
  */
object IndexStore {

  /** Save IVF centroids: header "k dim", then k·dim doubles row-major. */
  def saveIvf(model: IvfIndex.Model, dir: String): Unit = {
    val k = model.centroids.length
    require(k > 0, "empty model")
    val dim = model.centroids.head.length
    require(model.centroids.forall(_.length == dim), "ragged centroids")
    val sb = new StringBuilder(s"$k $dim\n")
    model.centroids.foreach(c => sb.append(c.mkString(" ")).append('\n'))
    val p = Paths.get(dir)
    Files.createDirectories(p)
    Files.write(p.resolve("ivf_centroids.txt"),
      sb.toString.getBytes(StandardCharsets.UTF_8))
  }

  def loadIvf(dir: String): IvfIndex.Model = {
    val lines = Files.readAllLines(
      Paths.get(dir).resolve("ivf_centroids.txt"), StandardCharsets.UTF_8)
    val Array(k, dim) = lines.get(0).split(" ").map(_.toInt)
    require(lines.size == k + 1, s"expected $k centroid rows, got ${lines.size - 1}")
    val centroids = (1 to k).map { i =>
      val row = lines.get(i).split(" ").map(java.lang.Double.parseDouble)
      require(row.length == dim, s"centroid ${i - 1} has ${row.length} dims, expected $dim")
      row
    }.toArray
    IvfIndex.Model(centroids)
  }

  /** Save an LSH plane tensor: header "tables bits dim", then one line
    * of dim doubles per (table, bit) in table-major order. */
  def savePlanes(planes: Array[Array[Array[Double]]], dir: String): Unit = {
    require(planes.nonEmpty && planes.head.nonEmpty && planes.head.head.nonEmpty)
    val (tables, bits, dim) = (planes.length, planes.head.length, planes.head.head.length)
    require(planes.forall(t => t.length == bits && t.forall(_.length == dim)),
      "ragged plane tensor")
    val sb = new StringBuilder(s"$tables $bits $dim\n")
    planes.foreach(_.foreach(p => sb.append(p.mkString(" ")).append('\n')))
    val p = Paths.get(dir)
    Files.createDirectories(p)
    Files.write(p.resolve("lsh_planes.txt"),
      sb.toString.getBytes(StandardCharsets.UTF_8))
  }

  def loadPlanes(dir: String): Array[Array[Array[Double]]] = {
    val lines = Files.readAllLines(
      Paths.get(dir).resolve("lsh_planes.txt"), StandardCharsets.UTF_8)
    val Array(tables, bits, dim) = lines.get(0).split(" ").map(_.toInt)
    require(lines.size == tables * bits + 1,
      s"expected ${tables * bits} plane rows, got ${lines.size - 1}")
    Array.tabulate(tables, bits) { (t, b) =>
      val row = lines.get(1 + t * bits + b).split(" ").map(java.lang.Double.parseDouble)
      require(row.length == dim, s"plane ($t,$b) has ${row.length} dims, expected $dim")
      row
    }
  }
}

package graft.spec

/** AST for the metric-view YAML spec.
  *
  * Field set mirrors the Databricks metric-view YAML exercised by the
  * reference (models/schema.yml:13-49, :65-130, :140-208 and
  * README.md:226-300): version, source, optional filter, dimensions,
  * measures (with optional stacked window specs + v1.1 semantic
  * metadata), nested joins, and a materialization section.
  */
final case class MetricViewSpec(
    version: String,
    source: String,
    filter: Option[String],
    dimensions: Seq[Dimension],
    measures: Seq[Measure],
    joins: Seq[JoinSpec],
    materialization: Option[Materialization]) {

  def dimension(name: String): Dimension =
    dimensions.find(_.name == name).getOrElse(
      sys.error(s"unknown dimension '$name' (have: ${dimensions.map(_.name).mkString(", ")})"))

  def measure(name: String): Measure =
    measures.find(_.name == name).getOrElse(
      sys.error(s"unknown measure '$name' (have: ${measures.map(_.name).mkString(", ")})"))

  /** Stable fingerprint of the materialization-relevant part of the spec;
    * used by createOrReplace to preserve existing materialization caches
    * when the spec is unchanged (reference macros/generate_metric_views
    * .sql:78-79 uses CREATE OR REPLACE for the same reason). */
  def materializationHash: String = {
    val relevant = (source, filter, dimensions.map(d => (d.name, d.expr)),
      measures.map(m => (m.name, m.expr, m.window.toString)),
      joins.toString, materialization.toString).toString
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(relevant.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
  }
}

/** Dimension: name + SQL expr (+ v1.1 display metadata,
  * models/schema.yml:144-152). */
final case class Dimension(
    name: String,
    expr: String,
    displayName: Option[String] = None,
    comment: Option[String] = None,
    synonyms: Seq[String] = Nil)

/** Measure: aggregate SQL expr, only addressable through MEASURE()
  * (models/schema.yml:25-31, :83-103, :154-208). */
final case class Measure(
    name: String,
    expr: String,
    window: Seq[WindowSpec] = Nil,
    displayName: Option[String] = None,
    comment: Option[String] = None,
    synonyms: Seq[String] = Nil,
    format: Option[Map[String, String]] = None) {
  def isWindowed: Boolean = window.nonEmpty
}

/** One level of a (possibly stacked) window measure spec
  * (models/schema.yml:92-103; README.md:250-277). */
final case class WindowSpec(
    order: String,
    range: RangeSpec,
    semiadditive: Option[String])

sealed trait RangeSpec
object RangeSpec {
  /** `range: trailing N <unit>` — frame of the last N units including
    * the current order value. */
  final case class Trailing(n: Int, unit: String) extends RangeSpec
  /** `range: cumulative` — running frame from the start. */
  case object Cumulative extends RangeSpec
  /** `range: current` — restrict to the current order value; as an outer
    * level of a stack this resets the inner frame per order value
    * (YTD pattern, README.md:267-277). */
  case object Current extends RangeSpec
  /** `range: prior N <unit>` — the single period exactly N units before
    * the current order value (empty → null when that period has no
    * rows). The period-over-period building block: `prior 1 month` is
    * last month's value, `prior 12 month` is the same month one year
    * back (YoY at month grain). Calendar units only (day/hour/month/
    * year) — `week` needs an anchor day and is rejected at parse. */
  final case class Prior(n: Int, unit: String) extends RangeSpec

  def parse(s: String): RangeSpec = s.trim.toLowerCase match {
    case "cumulative" => Cumulative
    case "current"    => Current
    case t =>
      val tr = "^trailing\\s+(\\d+)\\s+(\\w+?)s?$".r
      val pr = "^prior\\s+(\\d+)\\s+(\\w+?)s?$".r
      t match {
        case tr(n, unit) => Trailing(n.toInt, unit)
        case pr(_, "week") =>
          sys.error(s"'$s': prior-week frames are anchor-ambiguous; " +
            "use 'prior 7 day' or a month/year unit")
        case pr(n, unit) => Prior(n.toInt, unit)
        case _ => sys.error(s"unparseable window range '$s'")
      }
  }
}

/** Semantic join (README.md:281-300): left join applied lazily when a
  * query references a dimension under the join's dot-path; may nest. */
final case class JoinSpec(
    name: String,
    source: String,
    on: String,
    joins: Seq[JoinSpec] = Nil)

final case class Materialization(
    schedule: Option[Schedule],
    mode: Option[String],
    materializedViews: Seq[MatViewSpec])

/** Typed refresh schedule, parsed from `every N <unit>` at YAML-parse
  * time (reference models/schema.yml:36, :107) so garbage is rejected
  * at CREATE, not at refresh. DESCRIBE surfaces the reference's JSON
  * rendering (README.md:396). */
final case class Schedule(interval: Int, unit: String) {
  /** `{"type":"periodic","interval":6,"unit":"HOURS"}` */
  def json: String = s"""{"type":"periodic","interval":$interval,"unit":"$unit"}"""
  /** Schedule period in milliseconds (what a refresh daemon would arm). */
  def periodMillis: Long = unit match {
    case "MINUTES" => interval * 60L * 1000
    case "HOURS"   => interval * 3600L * 1000
    case "DAYS"    => interval * 86400L * 1000
    case "WEEKS"   => interval * 7L * 86400 * 1000
  }
}

object Schedule {
  private val Re = "(?i)^\\s*every\\s+(\\d+)\\s+(minute|hour|day|week)s?\\s*$".r
  def parse(s: String): Schedule = s match {
    case Re(n, u) =>
      val iv = n.toInt
      require(iv > 0, s"schedule interval must be positive: '$s'")
      Schedule(iv, u.toUpperCase + "S")
    case _ => sys.error(
      s"unparseable schedule '$s' (expected 'every N minutes/hours/days/weeks')")
  }
}

/** One pre-computed table: `unaggregated` = row-level baseline cache,
  * `aggregated` = rollup keyed by a dimension subset
  * (models/schema.yml:39-49, :110-129). */
final case class MatViewSpec(
    name: String,
    mvType: String,
    dimensions: Seq[String] = Nil,
    measures: Seq[String] = Nil) {
  def isAggregated: Boolean = mvType == "aggregated"
}

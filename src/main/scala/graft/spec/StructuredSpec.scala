package graft.spec

/** Structured-mode spec synthesis — the reference macro's second input
  * mode (macros/generate_metric_views.sql:45-76): dimensions/measures
  * given as plain (name, expr) lists (dim expr defaulting to its name)
  * are rendered to the same YAML grammar as raw mode, so both modes
  * flow through one parser/validator.
  */
object StructuredSpec {

  final case class Field(name: String, expr: Option[String] = None)

  /** Synthesize the YAML the reference macro would emit. */
  def yaml(
      source: String,
      dimensions: Seq[Field],
      measures: Seq[Field],
      filter: Option[String] = None,
      version: String = "0.1"): String = {
    val sb = new StringBuilder
    sb.append(s"version: $version\n")
    sb.append(s"source: $source\n")
    filter.foreach(f => sb.append(s"filter: $f\n"))
    if (dimensions.nonEmpty) {
      sb.append("dimensions:\n")
      dimensions.foreach { d =>
        sb.append(s"  - name: ${d.name}\n")
        sb.append(s"    expr: ${d.expr.getOrElse(d.name)}\n") // macro :63 default
      }
    }
    if (measures.nonEmpty) {
      sb.append("measures:\n")
      measures.foreach { m =>
        sb.append(s"  - name: ${m.name}\n")
        sb.append(s"    expr: ${m.expr.getOrElse(sys.error(s"measure ${m.name} requires expr"))}\n")
      }
    }
    sb.toString
  }

  def parse(
      source: String,
      dimensions: Seq[Field],
      measures: Seq[Field],
      filter: Option[String] = None,
      version: String = "0.1"): MetricViewSpec =
    YamlParser.parse(yaml(source, dimensions, measures, filter, version))
}

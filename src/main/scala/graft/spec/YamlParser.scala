package graft.spec

import org.yaml.snakeyaml.{LoaderOptions, Yaml}
import org.yaml.snakeyaml.constructor.SafeConstructor
import scala.jdk.CollectionConverters._

/** YAML → MetricViewSpec, via snakeyaml (ships on the Spark classpath).
  *
  * Accepts the exact grammar the reference emits (macros/
  * generate_metric_views.sql:31-76 — both raw-YAML mode and the
  * structured mode that synthesizes the same shape). SafeConstructor:
  * specs are data, never executable tags.
  */
object YamlParser {

  def parse(yaml: String): MetricViewSpec = {
    val loaded = new Yaml(new SafeConstructor(new LoaderOptions()))
      .load[java.util.Map[String, Object]](yaml)
    val root = asMap(loaded)
    MetricViewSpec(
      version = root.get("version").map(_.toString).getOrElse("0.1"),
      source = str(root, "source").getOrElse(sys.error("spec missing 'source'")),
      filter = str(root, "filter"),
      dimensions = seq(root, "dimensions").map(parseDimension),
      measures = seq(root, "measures").map(parseMeasure),
      joins = seq(root, "joins").map(parseJoin),
      materialization = root.get("materialization").map(m => parseMat(asMap(m))))
  }

  private def parseDimension(o: Object): Dimension = {
    val m = asMap(o)
    Dimension(
      name = req(m, "name"), expr = req(m, "expr"),
      displayName = str(m, "display_name"), comment = str(m, "comment"),
      synonyms = strSeq(m, "synonyms"))
  }

  private def parseMeasure(o: Object): Measure = {
    val m = asMap(o)
    Measure(
      name = req(m, "name"), expr = req(m, "expr"),
      window = seq(m, "window").map { w =>
        val wm = asMap(w)
        WindowSpec(
          order = req(wm, "order"),
          range = RangeSpec.parse(req(wm, "range")),
          semiadditive = str(wm, "semiadditive"))
      },
      displayName = str(m, "display_name"), comment = str(m, "comment"),
      synonyms = strSeq(m, "synonyms"),
      format = m.get("format").map(f =>
        asMap(f).map { case (k, v) => k -> v.toString }))
  }

  private def parseJoin(o: Object): JoinSpec = {
    val m = asMap(o)
    // YAML 1.1 resolves a bare `on` key to boolean true (the "Norway
    // problem") — the Databricks join grammar uses `on:` unquoted
    // (README.md:283-293), so accept it under either key.
    val on = str(m, "on").orElse(str(m, "true"))
      .getOrElse(sys.error(s"join missing 'on' clause in $m"))
    JoinSpec(
      name = req(m, "name"), source = req(m, "source"), on = on,
      joins = seq(m, "joins").map(parseJoin))
  }

  private def parseMat(m: Map[String, Object]): Materialization =
    Materialization(
      schedule = str(m, "schedule").map(Schedule.parse), mode = str(m, "mode"),
      materializedViews = seq(m, "materialized_views").map { v =>
        val vm = asMap(v)
        MatViewSpec(
          name = req(vm, "name"), mvType = req(vm, "type"),
          dimensions = strSeq(vm, "dimensions"),
          measures = strSeq(vm, "measures"))
      })

  private def asMap(o: Object): Map[String, Object] = o match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, v) => k.toString -> v.asInstanceOf[Object] }.toMap
    case other => sys.error(s"expected YAML mapping, got: $other")
  }
  private def seq(m: Map[String, Object], k: String): Seq[Object] =
    m.get(k).toSeq.flatMap {
      case l: java.util.List[_] => l.asScala.toSeq.map(_.asInstanceOf[Object])
      case other => sys.error(s"expected YAML sequence at '$k', got: $other")
    }
  private def strSeq(m: Map[String, Object], k: String): Seq[String] =
    seq(m, k).map(_.toString)
  private def str(m: Map[String, Object], k: String): Option[String] =
    m.get(k).map(_.toString)
  private def req(m: Map[String, Object], k: String): String =
    str(m, k).getOrElse(sys.error(s"missing required key '$k' in $m"))
}

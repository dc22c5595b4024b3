package graft.sqlext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParseException}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.sql.Row

/** SQL-string DDL surface for metric views — the reference's entire
  * lifecycle is SQL DDL (macros/generate_metric_views.sql:80-91,
  * macros/drop_metric_views.sql:19-23, README.md:385-397):
  *
  * {{{
  * CREATE OR REPLACE VIEW mv_order_metrics
  * COMMENT 'Order metrics'
  * WITH METRICS
  * LANGUAGE YAML
  * AS $$
  * version: 0.1
  * ...
  * $$
  *
  * DROP VIEW IF EXISTS mv_order_metrics;
  * DESCRIBE EXTENDED mv_order_metrics;
  * SHOW TBLPROPERTIES mv_order_metrics;
  * }}}
  *
  * Implemented as a pre-parse intercept: `$$`-quoted YAML is not Spark
  * SQL grammar, so the CREATE shape must be recognized before the stock
  * parser sees it; DROP/DESCRIBE/SHOW are stock grammar and are only
  * intercepted when the target is a registered metric view, leaving
  * every other statement byte-identical to stock Spark behavior.
  */
class MetricViewSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    OpsTvf.rewrite(SpineTvf.rewrite(
      MetricViewDdl.intercept(sqlText).getOrElse(delegate.parsePlan(sqlText))))

  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseTableSchema(sqlText: String): StructType = delegate.parseTableSchema(sqlText)
  override def parseRoutineParam(sqlText: String): StructType = delegate.parseRoutineParam(sqlText)
}

object MetricViewDdl {

  // CREATE [OR REPLACE] VIEW name [COMMENT '...'] WITH METRICS LANGUAGE YAML AS $$yaml$$
  // (clause order per the reference macro; COMMENT text uses '' to escape quotes)
  private val CreateRe =
    ("(?is)^\\s*CREATE\\s+(?:OR\\s+REPLACE\\s+)?VIEW\\s+([\\w.`]+)\\s+" +
      "(?:COMMENT\\s+'((?:[^']|'')*)'\\s+)?" +
      "WITH\\s+METRICS\\s+LANGUAGE\\s+YAML\\s+AS\\s*\\$\\$(.*?)\\$\\$\\s*;?\\s*$").r
  private val DropRe =
    "(?is)^\\s*DROP\\s+VIEW\\s+(IF\\s+EXISTS\\s+)?([\\w.`]+)\\s*;?\\s*$".r
  private val DescribeRe =
    "(?is)^\\s*(?:DESCRIBE|DESC)\\s+(?:EXTENDED\\s+)?([\\w.`]+)\\s*;?\\s*$".r
  private val ShowPropsRe =
    "(?is)^\\s*SHOW\\s+TBLPROPERTIES\\s+([\\w.`]+)\\s*;?\\s*$".r

  private def clean(name: String): String = name.replace("`", "")

  /** Returns the command plan when the statement is metric-view DDL,
    * None to fall through to the stock parser. */
  def intercept(sqlText: String): Option[LogicalPlan] = sqlText match {
    case CreateRe(name, comment, yaml) =>
      Some(CreateMetricViewCommand(clean(name),
        Option(comment).map(_.replace("''", "'")), yaml))
    case DropRe(ifExists, name) if SqlMetricViews.get(clean(name)).isDefined =>
      Some(DropMetricViewCommand(clean(name), ifExists != null))
    case DescribeRe(name) if SqlMetricViews.get(clean(name)).isDefined =>
      Some(DescribeMetricViewCommand(clean(name)))
    case ShowPropsRe(name) if SqlMetricViews.get(clean(name)).isDefined =>
      Some(DescribeMetricViewCommand(clean(name)))
    case _ => None
  }
}

/** CREATE OR REPLACE VIEW ... WITH METRICS: parse + validate the YAML
  * spec and register it in the session's bound metric-view catalog
  * (CREATE-time validation failures surface as the command's error,
  * exactly like the reference's run_query of the macro output). */
case class CreateMetricViewCommand(name: String, comment: Option[String], yaml: String)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val cat = SqlMetricViews.boundCatalog(session).getOrElse(sys.error(
      "no MetricViewCatalog bound to this session — construct one before using metric-view DDL"))
    cat.createOrReplace(name, yaml, comment)
    Seq.empty
  }
}

case class DropMetricViewCommand(name: String, ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    SqlMetricViews.get(name).foreach(_.owner.drop(name, ifExists))
    Seq.empty
  }
}

/** DESCRIBE EXTENDED / SHOW TBLPROPERTIES: one (key, value) row per
  * property (reference README.md:385-397). */
case class DescribeMetricViewCommand(name: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("key", StringType, nullable = false)(),
    AttributeReference("value", StringType, nullable = true)())
  override def run(session: SparkSession): Seq[Row] = {
    val v = SqlMetricViews.get(name).getOrElse(sys.error(s"unknown metric view '$name'"))
    v.owner.describe(name).collect().toSeq
  }
}

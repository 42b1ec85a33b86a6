package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

import graft.tables.{IcePartitionField, IcePartitionSpec}

/** Lightweight SQL front-end for the Iceberg DDL Spark's grammar lacks
  * (the role of the reference ecosystem's SQL-extensions grammar):
  *
  *   ALTER TABLE t ADD PARTITION FIELD <transform> [AS <name>]
  *   ALTER TABLE t DROP PARTITION FIELD <transform | name>
  *
  * where `<transform>` is a column name, `identity(col)`,
  * `bucket(n, col)`, `truncate(w, col)`, or `year|month|day|hour(col)`.
  * Every other statement delegates to Spark's parser untouched — two
  * statements do not need an ANTLR grammar. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val Add =
    """(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+ADD\s+PARTITION\s+FIELD\s+(.+?)(?:\s+AS\s+(\w+))?\s*;?\s*""".r
  private val Drop =
    """(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+DROP\s+PARTITION\s+FIELD\s+(.+?)\s*;?\s*""".r

  private def parts(s: String): Seq[String] =
    s.split('.').map(_.stripPrefix("`").stripSuffix("`")).toSeq

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Add(tbl, transform, alias) =>
      AlterPartitionFieldCommand(parts(tbl), add = true, transform.trim, Option(alias))
    case Drop(tbl, transform) =>
      AlterPartitionFieldCommand(parts(tbl), add = false, transform.trim, None)
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** `ALTER TABLE ... ADD/DROP PARTITION FIELD` against a graft catalog
  * table: metadata-only spec evolution — existing files keep their spec,
  * new writes cluster by the new one (same semantics as the API path
  * `GraftTable.updatePartitionSpec`, proven by `ice_spec_evolution`). */
case class AlterPartitionFieldCommand(
    table: Seq[String],
    add: Boolean,
    transformSql: String,
    alias: Option[String]) extends LeafRunnableCommand {

  private val FnRe = """(?i)(\w+)\s*\(\s*([^)]*)\s*\)""".r

  /** transform SQL -> (iceberg transform repr, source column, default name) */
  private def parseTransform(s: String): (String, String, String) = s match {
    case FnRe(fn, argstr) =>
      val args = argstr.split(',').map(_.trim.stripPrefix("`").stripSuffix("`")).toSeq
      fn.toLowerCase match {
        case "identity" => ("identity", args.head, args.head)
        case "bucket" => (s"bucket[${args.head.toInt}]", args(1), s"${args(1)}_bucket")
        case "truncate" => (s"truncate[${args.head.toInt}]", args(1), s"${args(1)}_trunc")
        case t @ ("year" | "month" | "day" | "hour") => (t, args.head, s"${args.head}_$t")
        case t @ ("years" | "months" | "days" | "hours") =>
          (t.dropRight(1), args.head, s"${args.head}_${t.dropRight(1)}")
        case other => sys.error(s"unsupported partition transform: $other")
      }
    case col => ("identity", col.stripPrefix("`").stripSuffix("`"), col)
  }

  override def run(session: SparkSession): Seq[Row] = {
    val cm = session.sessionState.catalogManager
    val (catName, path) =
      if (table.length > 1 && cm.isCatalogRegistered(table.head)) (table.head, table.tail)
      else (cm.currentCatalog.name, table)
    val cat = cm.catalog(catName) match {
      case g: graft.spark.GraftCatalog => g
      case other =>
        sys.error(s"ALTER ... PARTITION FIELD requires a graft catalog, got ${other.name}")
    }
    val t = cat.loadGraftTable(Identifier.of(path.init.toArray, path.last))
    val schema = t.metadata.currentSchema
    val current: List[IcePartitionField] = t.metadata.defaultSpec.fields
    def nameOfField(pf: IcePartitionField): String = pf.name
    if (add) {
      val (transform, srcCol, defName) = parseTransform(transformSql)
      val src = schema.findField(srcCol)
        .getOrElse(sys.error(s"no column $srcCol in ${table.mkString(".")}"))
      val name = alias.getOrElse(defName)
      require(!current.exists(_.name == name),
        s"partition field $name already exists")
      t.updatePartitionSpec(current :+ IcePartitionField(src.id, 0, transform, name))
    } else {
      // drop by field name, or by re-parsing the same transform expression
      val byName = current.filter(pf => nameOfField(pf) == transformSql.trim)
      val remaining =
        if (byName.nonEmpty) current.filterNot(pf => nameOfField(pf) == transformSql.trim)
        else {
          val (transform, srcCol, _) = parseTransform(transformSql)
          val srcId = schema.findField(srcCol)
            .getOrElse(sys.error(s"no column $srcCol")).id
          val matched = current.filter(pf =>
            pf.sourceId == srcId && pf.transform == transform)
          if (matched.isEmpty)
            sys.error(s"no partition field matches '$transformSql' " +
              s"(have: ${current.map(pf => s"${pf.name}=${pf.transform}").mkString(", ")})")
          current.filterNot(matched.contains)
        }
      t.updatePartitionSpec(remaining)
    }
    Seq.empty
  }
}

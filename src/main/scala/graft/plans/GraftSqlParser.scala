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
  private val Replace =
    """(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+REPLACE\s+PARTITION\s+FIELD\s+(.+?)\s+WITH\s+(.+?)(?:\s+AS\s+(\w+))?\s*;?\s*""".r
  private val CreateRef =
    ("""(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+CREATE\s+(BRANCH|TAG)\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)""" +
      """(?:\s+AS\s+OF\s+VERSION\s+(\d+))?""" +
      """(?:\s+RETAIN\s+(\d+)\s+(DAYS|HOURS|MINUTES))?""" +
      """(?:\s+WITH\s+SNAPSHOT\s+RETENTION\s+(\d+)\s+SNAPSHOTS(?:\s+(\d+)\s+(DAYS|HOURS|MINUTES))?)?\s*;?\s*""").r
  private val DropRef =
    """(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+DROP\s+(BRANCH|TAG)\s+(?:IF\s+EXISTS\s+)?(\w+)\s*;?\s*""".r
  private val WriteOrdered =
    """(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+WRITE\s+ORDERED\s+BY\s+(.+?)\s*;?\s*""".r
  private val SetIdFields =
    """(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+SET\s+IDENTIFIER\s+FIELDS\s+(.+?)\s*;?\s*""".r
  private val DropIdFields =
    """(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+DROP\s+IDENTIFIER\s+FIELDS\s*;?\s*""".r

  private def parts(s: String): Seq[String] =
    s.split('.').map(_.stripPrefix("`").stripSuffix("`")).toSeq

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Add(tbl, transform, alias) =>
      AlterPartitionFieldCommand(parts(tbl), add = true, transform.trim, Option(alias))
    case Replace(tbl, oldF, newF, alias) =>
      AlterPartitionFieldCommand(parts(tbl), add = true, newF.trim, Option(alias),
        replaceOld = Some(oldF.trim))
    case Drop(tbl, transform) =>
      AlterPartitionFieldCommand(parts(tbl), add = false, transform.trim, None)
    case CreateRef(tbl, kind, name, asOf, retainN, retainU, keepN, ageN, ageU) =>
      def ms(n: String, u: String): Long = n.toLong * (u.toUpperCase match {
        case "DAYS" => 86400000L
        case "HOURS" => 3600000L
        case _ => 60000L
      })
      AlterRefCommand(parts(tbl), create = true, kind.toLowerCase, name,
        asOfVersion = Option(asOf).map(_.toLong),
        maxRefAgeMs = Option(retainN).map(ms(_, retainU)),
        minSnapshotsToKeep = Option(keepN).map(_.toInt),
        maxSnapshotAgeMs = Option(ageN).map(ms(_, ageU)))
    case DropRef(tbl, kind, name) =>
      AlterRefCommand(parts(tbl), create = false, kind.toLowerCase, name)
    case WriteOrdered(tbl, order) =>
      WriteOrderedCommand(parts(tbl), order.trim)
    case SetIdFields(tbl, cols) =>
      SetIdentifierFieldsCommand(parts(tbl),
        cols.split(',').map(_.trim.stripPrefix("`").stripSuffix("`"))
          .filter(_.nonEmpty).toSeq)
    case DropIdFields(tbl) =>
      SetIdentifierFieldsCommand(parts(tbl), Nil)
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

/** shared resolution: multipart identifier -> GraftTable via the graft
  * catalog plugin (REST or warehouse mode) */
private[plans] object GraftDdl {
  def resolve(session: SparkSession, table: Seq[String]): graft.tables.GraftTable = {
    val cm = session.sessionState.catalogManager
    val (catName, path) =
      if (table.length > 1 && cm.isCatalogRegistered(table.head)) (table.head, table.tail)
      else (cm.currentCatalog.name, table)
    val cat = cm.catalog(catName) match {
      case g: graft.spark.GraftCatalog => g
      case other =>
        sys.error(s"this ALTER TABLE form requires a graft catalog, got ${other.name}")
    }
    cat.loadGraftTable(Identifier.of(path.init.toArray, path.last))
  }
}

/** `ALTER TABLE ... ADD/DROP PARTITION FIELD` against a graft catalog
  * table: metadata-only spec evolution — existing files keep their spec,
  * new writes cluster by the new one (same semantics as the API path
  * `GraftTable.updatePartitionSpec`, proven by `ice_spec_evolution`). */
case class AlterPartitionFieldCommand(
    table: Seq[String],
    add: Boolean,
    transformSql: String,
    alias: Option[String],
    /** `REPLACE PARTITION FIELD old WITH new`: drop `old` and add the new
      * transform in ONE spec commit (no window where neither field
      * partitions new writes) */
    replaceOld: Option[String] = None) extends LeafRunnableCommand {

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

  /** fields left after dropping the one named/denoted by `spec` */
  private def afterDrop(
      current: List[IcePartitionField],
      schema: graft.tables.IceSchema,
      spec: String): List[IcePartitionField] = {
    val byName = current.filter(_.name == spec.trim)
    if (byName.nonEmpty) current.filterNot(_.name == spec.trim)
    else {
      val (transform, srcCol, _) = parseTransform(spec)
      val srcId = schema.findField(srcCol)
        .getOrElse(sys.error(s"no column $srcCol")).id
      val matched = current.filter(pf =>
        pf.sourceId == srcId && pf.transform == transform)
      if (matched.isEmpty)
        sys.error(s"no partition field matches '$spec' " +
          s"(have: ${current.map(pf => s"${pf.name}=${pf.transform}").mkString(", ")})")
      current.filterNot(matched.contains)
    }
  }

  override def run(session: SparkSession): Seq[Row] = {
    val t = GraftDdl.resolve(session, table)
    val schema = t.metadata.currentSchema
    val current: List[IcePartitionField] = t.metadata.defaultSpec.fields
    if (add) {
      val base = replaceOld.map(afterDrop(current, schema, _)).getOrElse(current)
      val (transform, srcCol, defName) = parseTransform(transformSql)
      val src = schema.findField(srcCol)
        .getOrElse(sys.error(s"no column $srcCol in ${table.mkString(".")}"))
      val name = alias.getOrElse(defName)
      require(!base.exists(_.name == name),
        s"partition field $name already exists")
      t.updatePartitionSpec(base :+ IcePartitionField(src.id, 0, transform, name))
    } else {
      t.updatePartitionSpec(afterDrop(current, schema, transformSql))
    }
    Seq.empty
  }
}

/** `ALTER TABLE t CREATE|DROP BRANCH|TAG name` — branch forks from the
  * current head; drops refuse for "main". */
case class AlterRefCommand(
    table: Seq[String], create: Boolean, kind: String, refName: String,
    /** `AS OF VERSION <snapshot-id>` — fork from history, not the head */
    asOfVersion: Option[Long] = None,
    /** `RETAIN n DAYS|HOURS|MINUTES` — the ref's own expiry age */
    maxRefAgeMs: Option[Long] = None,
    /** `WITH SNAPSHOT RETENTION m SNAPSHOTS [n DAYS]` (branches only) */
    minSnapshotsToKeep: Option[Int] = None,
    maxSnapshotAgeMs: Option[Long] = None)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val t = GraftDdl.resolve(session, table)
    if (create) {
      val head = asOfVersion.map { id =>
        require(t.metadata.snapshotById(id).isDefined, s"no snapshot $id")
        id
      }.orElse(t.metadata.currentSnapshotId)
        .getOrElse(sys.error(s"cannot create $kind on an empty table"))
      require(kind == "branch" || (minSnapshotsToKeep.isEmpty && maxSnapshotAgeMs.isEmpty),
        "SNAPSHOT RETENTION applies to branches only")
      if (kind == "tag") t.createTag(refName, head, maxRefAgeMs)
      else t.createBranch(refName, head, maxRefAgeMs,
        minSnapshotsToKeep, maxSnapshotAgeMs)
    } else {
      val isTag = t.metadata.refs.get(refName).exists(_.refType == "tag")
      require(t.metadata.refs.contains(refName), s"no $kind $refName")
      require((kind == "tag") == isTag, s"$refName is not a $kind")
      t.dropRef(refName)
    }
    Seq.empty
  }
}

/** `ALTER TABLE t SET IDENTIFIER FIELDS a, b` / `DROP IDENTIFIER FIELDS`
  * — declares the schema's row-identity key (`identifier-field-ids`);
  * upserts and CDC default their equality keys to it. */
case class SetIdentifierFieldsCommand(table: Seq[String], cols: Seq[String])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    GraftDdl.resolve(session, table).setIdentifierFields(cols)
    Seq.empty
  }
}

/** `ALTER TABLE t WRITE ORDERED BY c1 [ASC|DESC] [NULLS FIRST|LAST], ...`
  * — declares the table sort order; subsequent writes sort within files
  * by it and stamp the order id (see `GraftTable.setSortOrder`). */
case class WriteOrderedCommand(table: Seq[String], orderSql: String)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val t = GraftDdl.resolve(session, table)
    val fields = orderSql.split(',').map(_.trim).filter(_.nonEmpty).toSeq.map { part =>
      val toks = part.split("\\s+").toSeq
      val name = toks.head.stripPrefix("`").stripSuffix("`")
      val dir =
        if (toks.exists(_.equalsIgnoreCase("DESC"))) "desc" else "asc"
      val nulls =
        if (toks.exists(_.equalsIgnoreCase("FIRST"))) "nulls-first"
        else if (toks.exists(_.equalsIgnoreCase("LAST"))) "nulls-last"
        // Iceberg defaults: NULLS FIRST for ASC, NULLS LAST for DESC
        else if (dir == "asc") "nulls-first"
        else "nulls-last"
      (name, dir, nulls)
    }
    t.setSortOrder(fields)
    Seq.empty
  }
}

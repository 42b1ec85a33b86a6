package graft.spark

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column => SqlColumn, SparkSession}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsOverwrite, SupportsTruncate, Write, WriteBuilder}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.tables._

/** DataSource V2 `TableCatalog` over the storage catalog, so the engine is
  * a first-class SQL citizen:
  *
  *   spark.sql.catalog.graft=graft.spark.GraftCatalog
  *   spark.sql.catalog.graft.warehouse=/path/wh
  *   spark.sql.catalog.graft.uri=http://...   (optional: REST mode — the
  *     catalog pointer lives behind the Iceberg-REST-shaped protocol with
  *     CAS commits; `warehouse` still roots the table DATA locations)
  *
  *   CREATE TABLE graft.db.t (...) PARTITIONED BY (months(ts));
  *   INSERT INTO graft.db.t SELECT ...;
  *   SELECT * FROM graft.db.t [VERSION AS OF <snapshot-id>];
  *
  * Reads and writes are fully native DSv2: delete-free snapshots go
  * through [[GraftNativeBatchScan]] (vectorized, packed FilePartitions),
  * anything with deletes / metadata columns / defaults through
  * [[GraftMorScan]] (plan-time delete state for small sets, executor-side
  * loading for jumbo ones); writes through [[GraftBatchWrite]]. */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.FunctionCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with StagingTableCatalog
    with org.apache.spark.sql.connector.catalog.ViewCatalog {

  private var catalogName: String = "graft"
  private var warehouse: String = _
  private var restUri: Option[String] = None
  @volatile private var restClient: RestCatalog.Client = _

  // session-scoped: per-session fs.* credentials set via spark.conf must
  // reach catalog metadata I/O exactly like the scan/write paths
  private def conf = org.apache.spark.sql.GraftBridge.sessionHadoopConf(SparkSession.active)

  /** REST mode: catalog pointer operations ride the HTTP client */
  private def rest: Option[RestCatalog.Client] = restUri.map { u =>
    if (restClient == null) restClient = new RestCatalog.Client(u, conf)
    restClient
  }

  private def nsOf(ident: Identifier): String = ident.namespace().mkString(".")

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse"))
      .getOrElse(sys.error(s"catalog $name requires option 'warehouse'"))
    restUri = Option(options.get("uri"))
  }

  override def name(): String = catalogName

  private def locationOf(ident: Identifier): String =
    (warehouse +: ident.namespace().toSeq :+ ident.name()).mkString("/")

  override def listTables(namespace: Array[String]): Array[Identifier] = rest match {
    case Some(c) =>
      c.listTables(namespace.mkString(".")).map(n => Identifier.of(namespace, n)).toArray
    case None =>
      val dir = new Path((warehouse +: namespace.toSeq).mkString("/"))
      val fs = dir.getFileSystem(conf)
      if (!fs.exists(dir)) return Array.empty
      fs.listStatus(dir).filter(_.isDirectory).map(_.getPath.getName)
        .filter(n => StorageCatalog.tableExists(conf, s"$dir/$n"))
        .map(n => Identifier.of(namespace, n))
  }

  private[graft] def loadGraftTable(ident: Identifier): GraftTable = rest match {
    case Some(c) =>
      try c.loadTable(nsOf(ident), ident.name())
      catch {
        case _: NoSuchElementException =>
          throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
      }
    case None =>
      val loc = locationOf(ident)
      if (!StorageCatalog.tableExists(conf, loc))
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
      StorageCatalog.loadTable(conf, loc)
  }

  override def loadTable(ident: Identifier): Table =
    try new GraftV2Table(loadGraftTable(ident), None, None)
    catch {
      case e: org.apache.spark.sql.catalyst.analysis.NoSuchTableException =>
        // `db.t.snapshots` etc: one extra identifier segment selects a
        // metadata view of `db.t` (see GraftMetadataTables)
        val kind = ident.name().toLowerCase(java.util.Locale.ROOT)
        val ns = ident.namespace()
        if (ns.length >= 1 &&
          (ident.name().startsWith("branch_") || ident.name().startsWith("tag_"))) {
          // `db.t.branch_x` / `db.t.tag_x`: the Iceberg ref-scoped
          // identifier form - reads pin to the ref head; branch
          // identifiers also accept appends/overwrites (committed to the
          // branch), tags refuse writes
          val isBranch = ident.name().startsWith("branch_")
          val ref = ident.name().stripPrefix(if (isBranch) "branch_" else "tag_")
          val parent = Identifier.of(ns.init, ns.last)
          val t =
            try loadGraftTable(parent)
            catch {
              case _: org.apache.spark.sql.catalyst.analysis.NoSuchTableException =>
                throw e
            }
          val r = t.metadata.refs.getOrElse(ref, throw e)
          new GraftV2Table(t, Some(r.snapshotId), None,
            writeBranch = if (isBranch) Some(ref) else None,
            refReadOnly = !isBranch)
        } else if (ns.length >= 1 && GraftMetadataTables.Kinds.contains(kind)) {
          val parent = Identifier.of(ns.init, ns.last)
          // only a MISSING parent falls back to the original error —
          // corrupt metadata / IO failures must surface, not masquerade
          // as "no such table"
          try new GraftMetadataTable(loadGraftTable(parent), kind)
          catch {
            case _: org.apache.spark.sql.catalyst.analysis.NoSuchTableException => throw e
          }
        } else throw e
    }

  /** SELECT ... VERSION AS OF <snapshot-id | 'branch' | 'tag'> */
  override def loadTable(ident: Identifier, version: String): Table = {
    val t = loadGraftTable(ident)
    val snapshotId = version.toLongOption.orElse(
      t.metadata.refs.get(version).map(_.snapshotId))
      .getOrElse(sys.error(
        s"VERSION AS OF '$version': neither a snapshot id nor a branch/tag of $ident"))
    new GraftV2Table(t, Some(snapshotId), None)
  }

  /** SELECT ... TIMESTAMP AS OF ts (micros since epoch) */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    new GraftV2Table(loadGraftTable(ident), None, Some(timestampMicros / 1000L))

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val iceSchema = SchemaConvert.fromSparkSchema(schema)
    if (viewExists(ident))
      sys.error(s"a view already exists at $ident")
    val fields = specFieldsOf(iceSchema, partitions)
    val props = properties.asScala.toMap.filter { case (k, _) => !k.startsWith("option.") }
    val t = rest match {
      case Some(c) =>
        // rename moves only the catalog pointer, so a later CREATE at the
        // old identifier must not reuse the renamed table's directory —
        // REST locations get a unique suffix (the Iceberg-catalog idiom)
        val loc = s"${locationOf(ident)}-${java.util.UUID.randomUUID().toString.take(8)}"
        c.createTable(nsOf(ident), ident.name(), StorageCatalog.newTableMetadata(
          loc, iceSchema, IcePartitionSpec(0, fields), props))
      case None =>
        StorageCatalog.createTable(
          conf, locationOf(ident), iceSchema, IcePartitionSpec(0, fields), props)
    }
    new GraftV2Table(t, None, None)
  }

  /** Spark partition `Transform`s → Iceberg partition-spec fields */
  private def specFieldsOf(
      iceSchema: IceSchema, partitions: Array[Transform]): List[IcePartitionField] =
    partitions.toList.zipWithIndex.map { case (tr, i) =>
      val (transform, sourceName) = tr.name() match {
        case "identity" => ("identity", tr.references().head.fieldNames().head)
        case "bucket" =>
          val n = tr.arguments().collectFirst {
            case lit: org.apache.spark.sql.connector.expressions.Literal[_] =>
              lit.value().toString.toInt
          }.getOrElse(sys.error("bucket needs a count"))
          (s"bucket[$n]", tr.references().head.fieldNames().head)
        case "truncate" =>
          val w = tr.arguments().collectFirst {
            case lit: org.apache.spark.sql.connector.expressions.Literal[_] =>
              lit.value().toString.toInt
          }.getOrElse(sys.error("truncate needs a width"))
          (s"truncate[$w]", tr.references().head.fieldNames().head)
        case "years" => ("year", tr.references().head.fieldNames().head)
        case "months" => ("month", tr.references().head.fieldNames().head)
        case "days" => ("day", tr.references().head.fieldNames().head)
        case "hours" => ("hour", tr.references().head.fieldNames().head)
        case other => sys.error(s"unsupported partition transform: $other")
      }
      val src = iceSchema.findField(sourceName)
        .getOrElse(sys.error(s"partition source $sourceName not in schema"))
      val name = transform match {
        case "identity" => sourceName
        case t if t.startsWith("bucket") => s"${sourceName}_bucket"
        case t if t.startsWith("truncate") => s"${sourceName}_trunc"
        case t => s"${sourceName}_$t"
      }
      IcePartitionField(src.id, 1000 + i, transform, name)
    }

  // ----- atomic CTAS / RTAS (StagingTableCatalog) -----

  /** One staged-table impl for CREATE/REPLACE/CREATE-OR-REPLACE AS
    * SELECT: data and manifests write under the table location as usual,
    * metadata versions stay in memory, and `commitStagedChanges` is ONE
    * atomic metadata commit — a failed CTAS leaves no table, a failed
    * RTAS leaves the old table (staged files are orphans for
    * `remove_orphan_files`). REST mode publishes via the same CAS commit
    * the catalog uses everywhere. */
  private def stage(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String],
      replace: Boolean,
      orReplace: Boolean): StagedTable = {
    val iceSchema = SchemaConvert.fromSparkSchema(schema)
    if (viewExists(ident))
      sys.error(s"a view already exists at $ident")
    val spec = IcePartitionSpec(0, specFieldsOf(iceSchema, partitions))
    val props = properties.asScala.toMap.filter { case (k, _) => !k.startsWith("option.") }
    rest match {
      case Some(c) =>
        // absence must be the ONLY path to None: a transient REST failure
        // misread as "no table" would turn RTAS into a spurious create
        val existing =
          try Some(c.loadTable(nsOf(ident), ident.name()))
          catch { case _: NoSuchElementException => None }
        if (existing.isDefined && !replace && !orReplace)
          throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
            ident.toString)
        if (existing.isEmpty && replace && !orReplace)
          throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
        // keep the old location on replace (its data/<uuid> dirs never
        // collide); fresh suffixed location on create
        val loc = existing.map(_.location).getOrElse(
          s"${locationOf(ident)}-${java.util.UUID.randomUUID().toString.take(8)}")
        val handle = StorageCatalog.stageTable(
          conf, loc, iceSchema, spec, props, replace, orReplace)
        new GraftStagedV2Table(handle.table,
          publishFn = () => {
            // metadataLog names staged in-memory versions that were never
            // written — publish a clean log (mirrors StagedHandle.publish)
            val meta = handle.table.metadata.copy(metadataLog = Nil)
            existing match {
              case Some(old) => c.commitTable(nsOf(ident), ident.name(), old.version, meta)
              case None => c.createTable(nsOf(ident), ident.name(), meta)
            }
          },
          abortFn = () => handle.abort())
      case None =>
        val handle = StorageCatalog.stageTable(
          conf, locationOf(ident), iceSchema, spec, props, replace, orReplace)
        new GraftStagedV2Table(handle.table, () => handle.publish(), () => handle.abort())
    }
  }

  private def structOf(columns: Array[Column]): StructType =
    StructType(columns.map(c =>
      org.apache.spark.sql.types.StructField(c.name(), c.dataType(), c.nullable())))

  override def stageCreate(
      ident: Identifier, columns: Array[Column], partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable =
    stage(ident, structOf(columns), partitions, properties, replace = false, orReplace = false)

  override def stageReplace(
      ident: Identifier, columns: Array[Column], partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable =
    stage(ident, structOf(columns), partitions, properties, replace = true, orReplace = false)

  override def stageCreateOrReplace(
      ident: Identifier, columns: Array[Column], partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable =
    stage(ident, structOf(columns), partitions, properties, replace = true, orReplace = true)

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val t = loadGraftTable(ident)
    def iceTypeOf(dt: org.apache.spark.sql.types.DataType): graft.tables.IceType =
      SchemaConvert.fromSparkSchema(StructType(Seq(
        org.apache.spark.sql.types.StructField("x", dt)))).fields.head.fieldType
    changes.foreach {
      case add: TableChange.AddColumn =>
        // multi-part names add INSIDE a struct column (nested evolution);
        // ids are reassigned past lastColumnId either way
        if (add.fieldNames().length == 1)
          t.addColumn(add.fieldNames().head, iceTypeOf(add.dataType()))
        else
          t.addColumnPath(add.fieldNames().toSeq, iceTypeOf(add.dataType()))
      case del: TableChange.DeleteColumn =>
        t.dropColumnPath(del.fieldNames().toSeq)
      case ren: TableChange.RenameColumn =>
        t.renameColumnPath(ren.fieldNames().toSeq, ren.newName())
      case upd: TableChange.UpdateColumnType =>
        t.updateColumnTypePath(upd.fieldNames().toSeq, iceTypeOf(upd.newDataType()))
      case nul: TableChange.UpdateColumnNullability =>
        t.updateColumnNullabilityPath(nul.fieldNames().toSeq, nul.nullable())
      case pos: TableChange.UpdateColumnPosition =>
        val after = pos.position() match {
          case a: TableChange.After => Some(a.column())
          case _ => None // First
        }
        t.moveColumnPath(pos.fieldNames().toSeq, after)
      case cmt: TableChange.UpdateColumnComment =>
        t.setColumnDocPath(cmt.fieldNames().toSeq,
          Option(cmt.newComment()).filter(_.nonEmpty))
      case dflt: TableChange.UpdateColumnDefaultValue =>
        // SET DEFAULT <literal> / DROP DEFAULT — write-default only
        val v = Option(dflt.newDefaultValue()).filter(_.nonEmpty).map { sqlStr =>
          val e = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
            .parseExpression(sqlStr)
          require(e.foldable, s"default must be a literal: $sqlStr")
          e.eval(null) match {
            case u: org.apache.spark.unsafe.types.UTF8String => u.toString
            case d: org.apache.spark.sql.types.Decimal => d.toBigDecimal.toString
            case other => other
          }
        }
        t.setColumnWriteDefaultPath(dflt.fieldNames().toSeq, v)
      case cb: TableChange.ClusterBy =>
        // ALTER TABLE ... CLUSTER BY (c1, c2) -> the declared write sort
        // order (same effect as WRITE ORDERED BY: files cluster/sort by
        // the columns and stamp the order id); CLUSTER BY () clears it
        t.setSortOrder(cb.clusteringColumns().toSeq
          .map(r => (r.fieldNames().mkString("."), "asc", "nulls-first")))
      case set: TableChange.SetProperty =>
        t.setProperties(Map(set.property() -> set.value()))
      case rm: TableChange.RemoveProperty =>
        t.removeProperties(Seq(rm.property()))
      case other => sys.error(s"unsupported table change: $other")
    }
    new GraftV2Table(t.refresh(), None, None)
  }

  override def dropTable(ident: Identifier): Boolean = {
    // the table's DATA location comes from its metadata, not from the
    // identifier — after a rename they differ (rename moves only the
    // catalog pointer)
    def deleteDir(l: String): Boolean = {
      val p = new Path(l)
      val fs = p.getFileSystem(conf)
      fs.exists(p) && fs.delete(p, true)
    }
    // with write.data.path set, data files live OUTSIDE the table dir —
    // a purge-style drop must remove that prefix too (best-effort: the
    // metadata may already be unreadable)
    def externalDataDir(l: String): Option[String] =
      try {
        val m = graft.tables.StorageCatalog.loadTable(conf, l).metadata
        m.properties.get("write.data.path")
      } catch { case _: Throwable => None }
    rest match {
      case Some(c) =>
        val loc =
          try Some(c.loadTable(nsOf(ident), ident.name()).metadata.location)
          catch { case _: NoSuchElementException => None }
        loc match {
          case None => false
          case Some(l) =>
            val ext = externalDataDir(l)
            c.dropTable(nsOf(ident), ident.name())
            deleteDir(l)
            ext.foreach(deleteDir)
            true
        }
      case None =>
        val l = locationOf(ident)
        val ext = externalDataDir(l)
        val ok = deleteDir(l)
        if (ok) ext.foreach(deleteDir)
        ok
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = rest match {
    case Some(c) =>
      // catalog-pointer move; data stays at metadata.location
      c.renameTable(nsOf(oldIdent), oldIdent.name(), nsOf(newIdent), newIdent.name())
    case None =>
      val src = new Path(locationOf(oldIdent))
      val dst = new Path(locationOf(newIdent))
      val fs = src.getFileSystem(conf)
      fs.mkdirs(dst.getParent)
      require(fs.rename(src, dst), s"rename $src -> $dst failed")
  }

  // ----- functions (partition transforms, resolvable in write plans) -----

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    GraftFunctions.names.map(n => Identifier.of(namespace, n)).toArray

  override def loadFunction(ident: Identifier): org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (GraftFunctions.names.contains(ident.name())) GraftFunctions.unbound(ident.name())
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)

  override def functionExists(ident: Identifier): Boolean =
    GraftFunctions.names.contains(ident.name())

  // ----- procedures (CALL graft.system.<name>(...)) -----

  /** Create a table from fully-formed metadata (the `snapshot` procedure):
    * the caller gets the mode-specific location to build its metadata
    * against — warehouse layout for path mode, a uniquely-suffixed
    * directory in REST mode (same idiom as [[createTable]]). */
  private[graft] def createTableFromMetadata(
      ident: Identifier, build: String => TableMetadata): GraftTable = rest match {
    case Some(c) =>
      val loc = s"${locationOf(ident)}-${java.util.UUID.randomUUID().toString.take(8)}"
      c.createTable(nsOf(ident), ident.name(), build(loc))
    case None =>
      StorageCatalog.createTableWithMetadata(
        conf, locationOf(ident), build(locationOf(ident)))
  }

  /** `register_table`: REST mode attaches an existing metadata file under
    * a new identifier (zero-copy). Path mode rejects — a path-based
    * catalog derives each table's location from its identifier, so there
    * is nothing to register a foreign location INTO (Iceberg's
    * HadoopCatalog refuses identically). */
  private[graft] def registerGraftTable(
      ident: Identifier, metadataLocation: String): GraftTable = rest match {
    case Some(c) => c.registerTable(nsOf(ident), ident.name(), metadataLocation)
    case None => sys.error(
      "register_table requires a REST catalog: path-based catalogs derive " +
        "table locations from identifiers (use the snapshot procedure, or " +
        "add_files, to import data into a path catalog)")
  }

  private lazy val procedures: Map[String, org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure] =
    GraftProcedures.forCatalog(
      catalogName, loadGraftTable, createTableFromMetadata, registerGraftTable)

  override def loadProcedure(ident: Identifier): org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    val ok = ident.namespace().sameElements(Array("system"))
    ok match {
      case true => procedures.getOrElse(ident.name().toLowerCase(java.util.Locale.ROOT),
        sys.error(s"no such procedure: ${ident.name()} (have: ${procedures.keys.toSeq.sorted.mkString(", ")})"))
      case false => sys.error(s"procedures live in the 'system' namespace: CALL $catalogName.system.${ident.name()}(...)")
    }
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      procedures.keys.toArray.sorted.map(n => Identifier.of(Array("system"), n))
    else Array.empty

  // ----- persisted SQL views (CREATE VIEW graft.db.v AS SELECT ...) -----

  override def listViews(namespace: String*): Array[Identifier] = rest match {
    case Some(c) =>
      c.listViews(namespace.mkString("."))
        .map(n => Identifier.of(namespace.toArray, n)).toArray
    case None =>
      val nsDir = (warehouse +: namespace).mkString("/")
      GraftViews.list(conf, nsDir)
        .map(n => Identifier.of(namespace.toArray, n)).toArray
  }

  override def loadView(ident: Identifier): org.apache.spark.sql.connector.catalog.View = rest match {
    case Some(c) =>
      val doc =
        try c.loadViewDoc(nsOf(ident), ident.name())
        catch {
          case _: NoSuchElementException =>
            throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
        }
      GraftViews.viewFromDoc(
        GraftViews.upgraded(doc, locationOf(ident)), ident.name(), None)
    case None =>
      val loc = locationOf(ident)
      if (!GraftViews.exists(conf, loc))
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
      GraftViews.read(conf, loc, ident.name())
  }

  override def viewExists(ident: Identifier): Boolean = rest match {
    case Some(c) => c.viewExists(nsOf(ident), ident.name())
    case None => GraftViews.exists(conf, locationOf(ident))
  }

  override def createView(info: org.apache.spark.sql.connector.catalog.ViewInfo)
      : org.apache.spark.sql.connector.catalog.View = {
    if (tableExists(info.ident()))
      sys.error(s"a table already exists at ${info.ident()}")
    rest match {
      case Some(c) =>
        val loc = locationOf(info.ident())
        c.createView(nsOf(info.ident()), info.ident().name(),
          GraftViews.buildDoc(None, loc, info))
        loadView(info.ident())
      case None =>
        val loc = locationOf(info.ident())
        GraftViews.write(conf, loc, info, orReplace = false)
        GraftViews.read(conf, loc, info.ident().name())
    }
  }

  override def replaceView(
      info: org.apache.spark.sql.connector.catalog.ViewInfo,
      orCreate: Boolean): org.apache.spark.sql.connector.catalog.View = {
    if (tableExists(info.ident()))
      sys.error(s"a table already exists at ${info.ident()}")
    rest match {
      case Some(c) =>
        val ns = nsOf(info.ident())
        val name = info.ident().name()
        val loc = locationOf(info.ident())
        val prior =
          try Some(GraftViews.upgraded(c.loadViewDoc(ns, name), loc))
          catch { case _: NoSuchElementException => None }
        if (prior.isEmpty && !orCreate)
          throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(info.ident())
        val doc = GraftViews.buildDoc(prior, loc, info)
        if (prior.isEmpty) c.createView(ns, name, doc) else c.replaceView(ns, name, doc)
        loadView(info.ident())
      case None =>
        val loc = locationOf(info.ident())
        if (!orCreate && !GraftViews.exists(conf, loc))
          throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(info.ident())
        GraftViews.write(conf, loc, info, orReplace = true)
        GraftViews.read(conf, loc, info.ident().name())
    }
  }

  override def alterView(
      ident: Identifier,
      changes: org.apache.spark.sql.connector.catalog.ViewChange*)
      : org.apache.spark.sql.connector.catalog.View = {
    val v = loadView(ident)
    val props = new java.util.LinkedHashMap[String, String](v.properties())
    changes.foreach {
      case s: org.apache.spark.sql.connector.catalog.ViewChange.SetProperty =>
        props.put(s.property(), s.value())
      case r: org.apache.spark.sql.connector.catalog.ViewChange.RemoveProperty =>
        props.remove(r.property())
      case other => sys.error(s"unsupported view change: $other")
    }
    val info = new org.apache.spark.sql.connector.catalog.ViewInfo(
      ident, v.query(), v.currentCatalog(), v.currentNamespace(), v.schema(),
      v.queryColumnNames(), v.columnAliases(), v.columnComments(), props)
    rest match {
      case Some(c) =>
        val ns = nsOf(ident)
        val prior = GraftViews.upgraded(
          c.loadViewDoc(ns, ident.name()), locationOf(ident))
        c.replaceView(ns, ident.name(),
          GraftViews.buildDoc(Some(prior), locationOf(ident), info))
      case None =>
        GraftViews.write(conf, locationOf(ident), info, orReplace = true)
    }
    loadView(ident)
  }

  override def dropView(ident: Identifier): Boolean = rest match {
    case Some(c) => c.dropView(nsOf(ident), ident.name())
    case None => GraftViews.drop(conf, locationOf(ident))
  }

  override def renameView(from: Identifier, to: Identifier): Unit = {
    if (!viewExists(from))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(from)
    if (tableExists(to))
      sys.error(s"cannot rename view $from to $to: a table already exists there")
    rest match {
      case Some(c) =>
        // the server moves the metadata pointer; versions ride along
        c.renameView(nsOf(from), from.name(), nsOf(to), to.name())
      case None =>
        val v = loadView(from)
        val info = new org.apache.spark.sql.connector.catalog.ViewInfo(
          to, v.query(), v.currentCatalog(), v.currentNamespace(), v.schema(),
          v.queryColumnNames(), v.columnAliases(), v.columnComments(), v.properties())
        GraftViews.write(conf, locationOf(to), info, orReplace = false)
        GraftViews.drop(conf, locationOf(from))
    }
  }

  // ----- namespaces -----

  override def listNamespaces(): Array[Array[String]] =
    listNamespaces(Array.empty)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = rest match {
    case Some(c) =>
      // direct children of `namespace` from the catalog's full listing
      c.listNamespaces().map(_.split('.'))
        .filter(parts => parts.length == namespace.length + 1 &&
          parts.startsWith(namespace))
        .toArray
    case None =>
      if (namespace.nonEmpty && !namespaceExists(namespace))
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(namespace)
      val dir = new Path((warehouse +: namespace.toSeq).mkString("/"))
      val fs = dir.getFileSystem(conf)
      if (!fs.exists(dir)) return Array.empty
      // a child DIRECTORY is a namespace unless it is a table root
      fs.listStatus(dir).filter(_.isDirectory).map(_.getPath.getName)
        .filterNot(n => StorageCatalog.tableExists(conf, s"$dir/$n"))
        .map(n => namespace :+ n)
  }

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(namespace)
    rest match {
      case Some(c) => c.namespaceProperties(namespace.mkString(".")).asJava
      case None =>
        val dir = (warehouse +: namespace.toSeq).mkString("/")
        (readNsProps(namespace) + ("location" -> dir)).asJava
    }
  }

  // ---- storage-catalog namespace properties: one small JSON dotfile per
  // namespace dir (tables are sibling DIRECTORIES, so the file never
  // collides with discovery; REST namespaces keep properties server-side)
  private def nsPropsPath(namespace: Array[String]): Path =
    new Path((warehouse +: namespace.toSeq).mkString("/"), ".graft_namespace.json")

  private def readNsProps(namespace: Array[String]): Map[String, String] = {
    val p = nsPropsPath(namespace)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      val body =
        try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      org.json4s.jackson.JsonMethods.parse(body) match {
        case org.json4s.JObject(fields) =>
          fields.collect { case (k, org.json4s.JString(v)) => k -> v }.toMap
        case _ => Map.empty
      }
    }
  }

  private def writeNsProps(namespace: Array[String], props: Map[String, String]): Unit = {
    val p = nsPropsPath(namespace)
    val fs = p.getFileSystem(conf)
    if (props.isEmpty) { fs.delete(p, false); () }
    else {
      val json = org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(org.json4s.JObject(
          props.toList.sortBy(_._1).map { case (k, v) =>
            k -> (org.json4s.JString(v): org.json4s.JValue)
          })))
      // write-to-temp + rename: a concurrent reader never sees a torn
      // file (rename is atomic on HDFS/posix; object stores degrade to
      // copy+delete but the dotfile is tiny and namespace props are
      // low-stakes)
      val tmp = new Path(p.getParent, s".graft_namespace.${java.util.UUID.randomUUID}.tmp")
      val out = fs.create(tmp, true)
      try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      // OVERWRITE-rename, not delete-then-rename: a concurrent reader
      // must never observe the props file missing (= empty props), and a
      // failed rename must keep the OLD state rather than lose it
      try {
        org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf)
          .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      } catch {
        // UnsupportedFileSystemException: FileContext resolves through the
        // fs.AbstractFileSystem.<scheme>.impl registry, which session-
        // registered filesystems (fs.<scheme>.impl only) never populate
        case _: UnsupportedOperationException |
             _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
          // filesystems without FileContext: shrink the window to the
          // minimum and restore visibility on failure by keeping tmp
          fs.delete(p, false)
          if (!fs.rename(tmp, p)) sys.error(s"rename $tmp -> $p failed")
        case e: Throwable =>
          fs.delete(tmp, false); throw e
      }
    }
  }

  override def namespaceExists(namespace: Array[String]): Boolean = rest match {
    case Some(c) => c.namespaceExists(namespace.mkString("."))
    case None =>
      // a table root is NOT a namespace (both are directories on disk)
      val loc = (warehouse +: namespace.toSeq).mkString("/")
      val dir = new Path(loc)
      dir.getFileSystem(conf).exists(dir) &&
        !StorageCatalog.tableExists(conf, loc)
  }

  override def createNamespace(
      namespace: Array[String], metadata: util.Map[String, String]): Unit = {
    // Spark owns the reserved keys (location/comment/owner arrive via
    // dedicated clauses); everything handed here is stored verbatim,
    // except location — this catalog lays namespaces out under its
    // warehouse root and cannot honor a foreign one
    val props = metadata.asScala.toMap - "location"
    rest match {
      case Some(c) => c.createNamespace(namespace.mkString("."), props)
      case None =>
        val dir = new Path((warehouse +: namespace.toSeq).mkString("/"))
        dir.getFileSystem(conf).mkdirs(dir)
        if (props.nonEmpty) writeNsProps(namespace, props)
    }
  }

  override def alterNamespace(
      namespace: Array[String], changes: NamespaceChange*): Unit = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(namespace)
    val updates = changes.collect {
      case s: NamespaceChange.SetProperty => s.property -> s.value
    }.toMap
    val removals = changes.collect {
      case r: NamespaceChange.RemoveProperty => r.property
    }
    rest match {
      case Some(c) =>
        c.updateNamespaceProperties(namespace.mkString("."), updates, removals.toSeq)
      case None =>
        // the read-modify-write is serialized within the JVM (the local
        // `local[n]` case where concurrent ALTER NAMESPACE is realistic);
        // cross-process writers still race, but each write is now atomic
        // via temp+rename so no reader observes a torn dotfile
        GraftCatalog.nsPropsLock.synchronized {
          writeNsProps(namespace, readNsProps(namespace) -- removals ++ updates)
        }
    }
  }

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = rest match {
    case Some(c) =>
      val ns = namespace.mkString(".")
      if (!c.namespaceExists(ns)) return false
      if (cascade)
        listTables(namespace).foreach(dropTable)
      // Spark's DropNamespaceExec ignores the boolean — a refused
      // non-cascade drop (namespace not empty) must THROW to be visible
      if (!c.dropNamespace(ns))
        throw new IllegalStateException(
          s"namespace $ns is not empty (use CASCADE)")
      true
    case None =>
      val dir = new Path((warehouse +: namespace.toSeq).mkString("/"))
      val fs = dir.getFileSystem(conf)
      if (!fs.exists(dir)) false
      else {
        // the properties dotfile doesn't make a namespace non-empty
        val onlyProps = fs.listStatus(dir)
          .forall(st => st.isFile && st.getPath.getName == ".graft_namespace.json")
        fs.delete(dir, cascade || onlyProps)
      }
  }
}

/** DSv2 table: native batch/MoR scans, native batch writes, and
  * filter-based SQL DELETE (merge-on-read position deletes). */
/** staged CTAS/RTAS table: a full [[GraftV2Table]] (reads + writes work
  * during the staged write) whose table only becomes visible when Spark
  * calls `commitStagedChanges` */
class GraftStagedV2Table(
    table: GraftTable,
    publishFn: () => Unit,
    abortFn: () => Unit)
    extends GraftV2Table(table, None, None) with StagedTable {
  override def commitStagedChanges(): Unit = publishFn()
  override def abortStagedChanges(): Unit = abortFn()
}

class GraftV2Table(
    val table: GraftTable,
    snapshotId: Option[Long],
    asOfTimestampMs: Option[Long],
    writeBranch: Option[String] = None,
    refReadOnly: Boolean = false)
    extends Table with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
    with org.apache.spark.sql.connector.catalog.TruncatableTable {

  private def requireMain(op: String): Unit =
    if (writeBranch.isDefined || refReadOnly)
      sys.error(s"$op on a branch/tag identifier is not supported - " +
        "run it against the table and publish with fast_forward")

  /** TRUNCATE TABLE: metadata-only drop-everything snapshot */
  override def truncateTable(): Boolean = {
    requireMain("TRUNCATE"); table.truncate(); true
  }

  /** UPDATE / MERGE INTO / subquery DELETE. The write mode decides the
    * shape: `merge-on-read` (the default — matched rows become position
    * deletes, [[GraftRowLevelOperation]]) optimizes the write;
    * `copy-on-write` ([[GraftCopyOnWriteOperation]] — matched FILES are
    * rewritten without their matched rows and atomically swapped)
    * optimizes every read after it. Per-command table properties
    * `write.delete.mode` / `write.update.mode` / `write.merge.mode`, the
    * Iceberg property surface. Filter-only DELETEs still short-circuit
    * through [[canDeleteWhere]] (metadata-only) in either mode. */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    requireMain("a row-level operation")
    import org.apache.spark.sql.connector.write.RowLevelOperation.Command
    val prop = info.command() match {
      case Command.DELETE => "write.delete.mode"
      case Command.UPDATE => "write.update.mode"
      case _ => "write.merge.mode"
    }
    table.metadata.properties.getOrElse(prop, "merge-on-read").trim match {
      case "copy-on-write" =>
        () => new GraftCopyOnWriteOperation(table, info.command())
      case "merge-on-read" =>
        () => new GraftRowLevelOperation(table, info.command())
      case other => sys.error(
        s"$prop = '$other': supported write modes are merge-on-read and copy-on-write")
    }
  }

  /** `_file` / `_pos` as SQL-selectable metadata columns (the reference's
    * scan-offset coordinates, icelake/src/io/scan.rs:25-28, surfaced
    * relationally): `SELECT _file, _pos FROM t` feeds positionDelete and
    * row-level tooling. */
  override def metadataColumns(): Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = "_file"
        override def dataType(): org.apache.spark.sql.types.DataType =
          org.apache.spark.sql.types.StringType
        override def isNullable: Boolean = false
        override def comment(): String = "data file path of the row"
      },
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = "_pos"
        override def dataType(): org.apache.spark.sql.types.DataType =
          org.apache.spark.sql.types.LongType
        override def isNullable: Boolean = false
        override def comment(): String = "row position within its data file"
      },
      // format-v3 row lineage: file first_row_id + position; null when
      // the file carries no ids (pre-v3 files, unmaterialized rewrites)
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = "_row_id"
        override def dataType(): org.apache.spark.sql.types.DataType =
          org.apache.spark.sql.types.LongType
        override def isNullable: Boolean = true
        override def comment(): String = "format-v3 row lineage id"
      },
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = "_last_updated_sequence_number"
        override def dataType(): org.apache.spark.sql.types.DataType =
          org.apache.spark.sql.types.LongType
        override def isNullable: Boolean = true
        override def comment(): String = "data sequence that last wrote the row"
      },
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = "_spec_id"
        override def dataType(): org.apache.spark.sql.types.DataType =
          org.apache.spark.sql.types.IntegerType
        override def isNullable: Boolean = false
        override def comment(): String = "partition spec id of the row's data file"
      },
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = "_partition"
        override def dataType(): org.apache.spark.sql.types.DataType =
          GraftMetadataTables.partitionStruct(table.metadata)
        override def isNullable: Boolean = true
        override def comment(): String =
          "partition tuple of the row's data file (default-spec shape)"
      },
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = "_deleted"
        override def dataType(): org.apache.spark.sql.types.DataType =
          org.apache.spark.sql.types.BooleanType
        override def isNullable: Boolean = false
        override def comment(): String =
          "MoR delete flag: selecting it serves deleted rows flagged, not filtered"
      })

  /** `DELETE FROM t WHERE ...`: any exactly-translatable predicate is
    * accepted and executed as position deletes for the matching rows —
    * one MoR snapshot, no data rewritten. Untranslatable predicates are
    * rejected in `canDeleteWhere`, so Spark raises a clear error instead
    * of silently deleting the wrong rows. */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.isEmpty || FilterToColumn.convertStrict(filters).isDefined

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val spark = SparkSession.active
    val cond = FilterToColumn.convertStrict(filters)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    table.deleteWhere(spark, cond)
    ()
  }

  override def name(): String = table.location

  override def schema(): StructType = {
    val schema = (snapshotId, asOfTimestampMs) match {
      case (None, None) => table.metadata.currentSchema
      case _ =>
        table.resolveSnapshot(snapshotId, asOfTimestampMs)
          .map(table.metadata.schemaFor).getOrElse(table.metadata.currentSchema)
    }
    SchemaConvert.toSparkSchema(schema)
  }

  override def partitioning(): Array[Transform] =
    KeyedPartitioning.v2Transforms(table)

  override def properties(): util.Map[String, String] =
    table.metadata.properties.asJava

  override def capabilities(): util.Set[TableCapability] =
    Set(
      TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.OVERWRITE_DYNAMIC,
      TableCapability.TRUNCATE,
      // `MERGE INTO ... WITH SCHEMA EVOLUTION`: the analyzer adds the
      // source's new columns through alterTable (AddColumn — the same
      // id-assigning evolution path as ALTER TABLE) before resolving the
      // merge, so CDC sources can widen the target mid-stream
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // facade option: restrict the DATA side to a path subset (selective
    // compaction reads just the files being rewritten); newline-joined
    val onlyFiles = Option(options.get(GraftV2Table.OnlyFilesOption))
      .map(_.split('\n').toSet)
    // incremental append scan between snapshots:
    //   spark.read.option("start-snapshot-id", a)[.option("end-snapshot-id", b)]
    //     .table("graft.db.t")
    // reads rows appended AFTER a, up to b (default: current)
    val startSnap = Option(options.get("start-snapshot-id")).map(_.toLong)
    val endSnap = Option(options.get("end-snapshot-id")).map(_.toLong)
    new GraftScanBuilder(table, endSnap.orElse(snapshotId), asOfTimestampMs,
      schema(), onlyFiles, startSnap)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    if (refReadOnly)
      sys.error(s"${name()}: a tag is immutable - writes need a branch")
    new GraftWriteBuilder(table, writeBranch)
  }
}

object GraftV2Table {
  val OnlyFilesOption = "graft.only-files"
}

/** Fixed-file-list RAW read (the changelog's internal read shape): serves
  * exactly `planned` with NO delete application, any data-file format,
  * optionally with the `_file`/`_pos` columns appended — rides the MoR
  * scan, whose per-format readers count row positions for parquet, orc
  * and avro alike. Historical files (not live in any current snapshot)
  * are fine: nothing here resolves a snapshot. */
class GraftRawFilesTable(
    table: GraftTable,
    planned: Seq[PlannedFile],
    withPos: Boolean)
    extends Table with SupportsRead {
  private val iceSchema = table.metadata.currentSchema
  private val dataSchema = SchemaConvert.toSparkSchema(iceSchema)
  private val outSchema =
    if (!withPos) dataSchema
    else StructType(dataSchema.fields ++ Seq(
      org.apache.spark.sql.types.StructField(
        "_file", org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField(
        "_pos", org.apache.spark.sql.types.LongType, nullable = false)))
  override def name(): String = s"graft_raw(${table.location})"
  override def schema(): StructType = outSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan =
        new GraftMorScan(table, iceSchema, planned, Nil, Nil, dataSchema, outSchema)
    }
}

class GraftScanBuilder(
    table: GraftTable,
    snapshotId: Option[Long],
    asOfTimestampMs: Option[Long],
    fullSchema: StructType,
    onlyFiles: Option[Set[String]] = None,
    startSnapshotId: Option[Long] = None)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit {

  private var pushedFiltersArr: Array[Filter] = Array.empty
  private var requiredSchema: StructType = fullSchema
  private var pushedLimit: Option[Int] = None

  /** LIMIT pushdown = FILE-LIST truncation: an unfiltered, delete-free
    * `LIMIT n` needs only enough files to cover n rows by manifest
    * recordCount, so planning stops enumerating splits after them — at
    * 10^5 files a `SELECT * ... LIMIT 10` plans one split instead of all.
    * Returns false (partial): Spark re-applies the limit above the scan,
    * so over-delivery is always safe; with filters/deletes/row-meta the
    * truncation is skipped entirely (recordCount no longer bounds live
    * matching rows). */
  override def pushLimit(limit: Int): Boolean = {
    pushedLimit = Some(limit)
    false
  }

  // metadata-only aggregate pushdown (COUNT/MIN/MAX from manifest stats).
  // Memoized: Spark probes supportCompletePushDown before pushAggregation
  // with the same Aggregation, and planning reads manifests.
  private var aggProbe: Option[(org.apache.spark.sql.connector.expressions.aggregate.Aggregation,
    Option[(StructType, org.apache.spark.sql.catalyst.InternalRow)])] = None
  private var pushedAgg: Option[(StructType, org.apache.spark.sql.catalyst.InternalRow)] = None

  private def tryAgg(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[(StructType, org.apache.spark.sql.catalyst.InternalRow)] = {
    aggProbe match {
      case Some((prev, res)) if prev == agg => res
      case _ =>
        val res =
          if (pushedFiltersArr.nonEmpty || onlyFiles.nonEmpty || startSnapshotId.nonEmpty) None
          else table.resolveSnapshot(snapshotId, asOfTimestampMs) match {
            case None =>
              StatsAggregate.tryCompute(agg, Nil, table.metadata.currentSchema)
            case Some(s) =>
              val timeTravel = snapshotId.isDefined || asOfTimestampMs.isDefined
              val iceSchema =
                if (timeTravel) table.metadata.schemaFor(s)
                else table.metadata.currentSchema
              StatsAggregate.tryCompute(agg, table.planFiles(s, None), iceSchema)
          }
        aggProbe = Some((agg, res))
        res
    }
  }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    tryAgg(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    // only complete answers are pushed: partial metadata rows would be
    // re-aggregated correctly for these functions, but add no value
    pushedAgg = tryAgg(agg)
    pushedAgg.isDefined
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // keep them for file-level pruning; report all as unhandled so Spark
    // re-applies row-level (pruning is an optimization, not a contract)
    pushedFiltersArr = filters
    filters
  }

  override def pushedFilters(): Array[Filter] = pushedFiltersArr

  override def pruneColumns(required: StructType): Unit =
    // data columns keep their field-id metadata from the table schema;
    // `_file`/`_pos` metadata columns pass through as requested
    requiredSchema = StructType(required.fields.map { f =>
      fullSchema.fields.find(_.name == f.name).getOrElse(f)
    })

  override def build(): Scan = {
    pushedAgg match {
      case Some((aggSchema, row)) =>
        // the whole query result came from manifest stats: a driver-side
        // LocalScan (plans as LocalTableScanExec — zero files opened)
        Metrics.inc(Metrics.ScansPlanned)
        return new GraftStatsScan(table, aggSchema, row)
      case None =>
    }
    // ONE planning pass (manifests are read once per query): prune data
    // and delete files against the pushed filters, then pick the scan —
    //  - no deletes: native batch scan, packed FilePartitions
    //  - deletes / metadata columns / defaults: native MoR scan (delete
    //    state plan-time for small sets, executor-side for jumbo ones)
    val needsRowMeta = requiredSchema.fieldNames.exists(n =>
      n == "_file" || n == "_pos" || n == "_row_id" ||
        n == "_last_updated_sequence_number" || n == "_spec_id" ||
        n == "_partition" || n == "_deleted")
    table.resolveSnapshot(snapshotId, asOfTimestampMs) match {
      case None =>
        // no snapshot: an empty native scan (zero partitions)
        new GraftNativeBatchScan(
          table, table.metadata.currentSchema, Nil, fullSchema, requiredSchema, pushedFiltersArr)
      case Some(s) =>
        val timeTravel = snapshotId.isDefined || asOfTimestampMs.isDefined
        val iceSchema =
          if (timeTravel) table.metadata.schemaFor(s) else table.metadata.currentSchema
        val pruneFilter = FilterToColumn.convert(pushedFiltersArr)
        // distributed planning above the manifest threshold: file-level
        // pruning moves into executors and only survivors are collected
        // (the prunePlanned calls below are idempotent re-applications)
        val planned = table.planFilesPruned(
          org.apache.spark.sql.SparkSession.active, s, pruneFilter, iceSchema)
        // incremental append scan: only files committed AFTER the start
        // snapshot (by data sequence). Deletes do not apply — the result
        // is the appended-rows changelog between the two snapshots.
        val fromSeq = startSnapshotId.map { id =>
          table.metadata.snapshotById(id)
            .getOrElse(sys.error(s"no snapshot $id for start-snapshot-id"))
            .sequenceNumber
        }
        // incremental: replace-aware walk (rewrites contribute nothing,
        // absorbed appends resolve through their own snapshots)
        val allData = fromSeq
          .map(fs => table.incrementalAddedFiles(fs, s))
          .getOrElse(planned.filter(_.file.content == DataContent.Data))
          .filter(p => onlyFiles.forall(_.contains(GraftTable.normPathStr(p.file.filePath))))
        val data = PruneEval.prunePlanned(allData, pruneFilter, table.metadata, iceSchema)
        Metrics.inc(Metrics.ScansPlanned)
        Metrics.inc(Metrics.FilesPruned, (allData.size - data.size).toLong)
        val deletes =
          if (fromSeq.isDefined) Nil
          else planned.filter(_.file.content != DataContent.Data)
        // delete files prune like the facade scan (safe because Spark
        // re-applies every filter above the scan): a snapshot whose
        // deletes all prune away reads through the vectorized batch scan
        val posD = PruneEval.prunePlanned(
          deletes.filter(_.file.content == DataContent.PositionDeletes),
          pruneFilter, table.metadata, iceSchema)
        val eqD = PruneEval.prunePlanned(
          deletes.filter(_.file.content == DataContent.EqualityDeletes),
          pruneFilter, table.metadata, iceSchema)
        // files predating an initial-default column serve the default as
        // a per-file literal in the row-level scan
        val needsDefaults = iceSchema.fields.exists(f =>
          f.initialDefault.isDefined && data.exists(p =>
            p.file.columnSizes.nonEmpty && !p.file.columnSizes.contains(f.id)))
        if (posD.nonEmpty || eqD.nonEmpty || needsRowMeta || needsDefaults) {
          Metrics.inc(Metrics.FilesScanned, data.size.toLong)
          new GraftMorScan(table, iceSchema, data, posD, eqD, fullSchema, requiredSchema,
            pushedFiltersArr)
        } else {
          // safe truncation point: no deletes, no filters, no row metadata
          // — every planned file's recordCount is fully live, so a prefix
          // covering the limit suffices (Spark re-applies the LIMIT above)
          val limited = pushedLimit match {
            case Some(n) if pushedFiltersArr.isEmpty =>
              var acc = 0L
              data.takeWhile { p =>
                val need = acc < n
                acc += p.file.recordCount
                need
              }
            case _ => data
          }
          Metrics.inc(Metrics.FilesScanned, limited.size.toLong)
          new GraftNativeBatchScan(
            table, iceSchema, limited, fullSchema, requiredSchema, pushedFiltersArr)
        }
    }
  }
}

/** Driver-side scan carrying a fully-aggregated result computed from
  * manifest statistics — Spark plans it as a LocalTableScan; no executor
  * work, no file I/O. See [[StatsAggregate]]. */
/** table statistics from planned-file manifest stats — no files opened */
object GraftScanStats {
  def of(
      files: Seq[PlannedFile],
      dataSchema: StructType,
      requiredSchema: StructType,
      iceSchema: IceSchema,
      ndv: Map[Int, Long] = Map.empty): org.apache.spark.sql.connector.read.Statistics = {
    val data = files.filter(_.file.content == DataContent.Data)
    val rows = data.map(_.file.recordCount).sum
    val totalBytes = data.map(_.file.fileSizeInBytes).sum
    // scale to the projected columns: exact per-column byte sums when the
    // footers recorded them, width-ratio fallback otherwise
    val projIds = requiredSchema.fieldNames
      .flatMap(n => iceSchema.findField(n).map(_.id)).toSet
    val colScaled = data.map { p =>
      val cs = p.file.columnSizes
      if (cs.isEmpty || projIds.isEmpty) -1L
      else cs.collect { case (id, b) if projIds.contains(id) => b }.sum
    }
    val scaledBytes =
      if (colScaled.nonEmpty && colScaled.forall(_ >= 0)) colScaled.sum
      else if (dataSchema.fields.nonEmpty && requiredSchema.fields.nonEmpty)
        (totalBytes * math.min(1.0,
          requiredSchema.fields.length.toDouble / dataSchema.fields.length)).toLong
      else totalBytes
    // per-column stats for Spark's CBO: NDV from the table's registered
    // statistics file (ANALYZE/compute_table_stats — blob properties read
    // from metadata, zero plan-time I/O), null counts folded from the
    // manifests. Drives join-size estimation when spark.sql.cbo.enabled.
    val colStats = new java.util.HashMap[
      org.apache.spark.sql.connector.expressions.NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
    requiredSchema.fieldNames.foreach { n =>
      iceSchema.findField(n).foreach { f =>
        val d = ndv.get(f.id)
        val nulls =
          if (data.nonEmpty && data.forall(_.file.nullValueCounts.contains(f.id)))
            Some(data.map(_.file.nullValueCounts(f.id)).sum)
          else None
        if (d.isDefined || nulls.isDefined)
          colStats.put(Expressions.column(n),
            new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
              override def distinctCount(): java.util.OptionalLong =
                d.map(java.util.OptionalLong.of).getOrElse(java.util.OptionalLong.empty)
              override def nullCount(): java.util.OptionalLong =
                nulls.map(java.util.OptionalLong.of).getOrElse(java.util.OptionalLong.empty)
            })
      }
    }
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(math.max(scaledBytes, 1L))
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(rows)
      override def columnStats(): java.util.Map[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = colStats
    }
  }
}

class GraftStatsScan(
    table: GraftTable,
    aggSchema: StructType,
    row: org.apache.spark.sql.catalyst.InternalRow)
    extends org.apache.spark.sql.connector.read.LocalScan {
  override def readSchema(): StructType = aggSchema
  override def rows(): Array[org.apache.spark.sql.catalyst.InternalRow] = Array(row)
  override def description(): String =
    s"GraftStatsScan(${table.location}, metadata-only aggregate)"
}

/** Native DSv2 scan of a delete-free snapshot: plan-time pruned files ->
  * packed FilePartitions -> Spark's vectorized parquet reader with pushed
  * filters. Files are pre-planned in [[GraftScanBuilder.build]].
  *
  * Two scale features ride on top:
  *  - runtime (join-driven) file pruning — Spark hands the scan the
  *    joinable values of partition-source columns at execution time
  *    (dynamic partition pruning); [[PruneEval]] drops every file whose
  *    partition tuple / bounds cannot match;
  *  - storage-partitioned joins — with `spark.sql.sources.v2.bucketing
  *    .enabled`, the scan reports its partition transforms as a
  *    KeyGroupedPartitioning and keys every InputPartition, so a join of
  *    two co-partitioned graft tables runs with NO shuffle. */
class GraftNativeBatchScan(
    table: GraftTable,
    iceSchema: IceSchema,
    files: Seq[PlannedFile],
    dataSchema: StructType,
    requiredSchema: StructType,
    filters: Array[Filter])
    extends Scan with org.apache.spark.sql.connector.read.Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning
    with org.apache.spark.sql.connector.read.SupportsReportOrdering
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  @volatile private var currentFiles: Seq[PlannedFile] = files

  override def readSchema(): StructType = requiredSchema

  /** Sorted-scan reporting: when every planned file was written under the
    * table's current default sort order (identity fields, all projected),
    * each FILE's rows are sorted, so with one-file-per-partition packing
    * (see [[planInputPartitions]]) every partition satisfies the order
    * and Spark's RemoveRedundantSorts elides downstream local sorts —
    * the payoff of `write.sort-order` at read time. File RANGES preserve
    * it too (a contiguous slice of a sorted file is sorted). Declared
    * ordering must survive column pruning: a pruned-away sort column
    * would leave an unresolvable ordering expression, so reporting is
    * dropped instead. */
  private lazy val reportedOrdering: Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    import org.apache.spark.sql.connector.expressions.{Expressions, NullOrdering, SortDirection}
    val order = table.metadata.sortOrders
      .find(_.orderId == table.metadata.defaultSortOrderId)
      .filter(_.fields.nonEmpty)
    val names = order.map(_.fields.map(f =>
      iceSchema.fieldById(f.sourceId).map(_.name).getOrElse("")))
    // SPJ groups same-key files into one partition — concatenated sorted
    // files are not sorted, so the two reports are mutually exclusive
    val ok = order.isDefined && files.nonEmpty && keyedTransforms.isEmpty &&
      files.forall(p => p.file.sortOrderId.contains(order.get.orderId) &&
        p.file.fileFormat == "parquet") &&
      order.get.fields.forall(_.transform == "identity") &&
      names.get.forall(n => n.nonEmpty && requiredSchema.fieldNames.contains(n))
    if (!ok) Array.empty
    else order.get.fields.zip(names.get).map { case (f, n) =>
      Expressions.sort(
        Expressions.column(n),
        if (f.direction == "desc") SortDirection.DESCENDING else SortDirection.ASCENDING,
        if (f.nullOrder == "nulls-last") NullOrdering.NULLS_LAST
        else NullOrdering.NULLS_FIRST)
    }.toArray
  }

  override def outputOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    reportedOrdering

  /** Planned-file statistics, scaled to the projected columns. Without
    * this a DSv2 relation sizes as `defaultSizeInBytes` (effectively
    * infinite) and Spark will NEVER auto-broadcast a small graft
    * dimension in a join — the single most important planning signal at
    * scale. Column scaling uses the footer column sizes when present. */
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    GraftScanStats.of(currentFiles, dataSchema, requiredSchema, iceSchema, table.ndvStats)

  override def toBatch: org.apache.spark.sql.connector.read.Batch = this

  // ---- runtime (join-driven) file pruning ----

  private def partitionSourceNames: Seq[String] =
    table.metadata.defaultSpec.fields
      .flatMap(pf => iceSchema.fieldById(pf.sourceId).map(_.name)).distinct

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    // only columns surviving column pruning: Spark's DPP rule resolves
    // these against the scan OUTPUT and throws on a pruned-out column
    partitionSourceNames.filter(requiredSchema.fieldNames.contains)
      .map(Expressions.column).toArray

  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    val v1 = org.apache.spark.sql.GraftBridge.predicatesToV1(predicates)
    FilterToColumn.convert(v1).foreach { c =>
      val before = currentFiles.size
      currentFiles = PruneEval.prunePlanned(currentFiles, Some(c), table.metadata, iceSchema)
      Metrics.inc(Metrics.FilesPruned, (before - currentFiles.size).toLong)
    }
  }

  // ---- storage-partitioned joins ----

  /** SPJ mode, decided at scan build: the session opted into v2
    * bucketing, the table is partitioned, and every file carries the
    * default spec's full partition tuple */
  private val keyedTransforms: Option[Array[Transform]] = {
    val conf = SparkSession.active.sessionState.conf
    val spec = table.metadata.defaultSpec
    // SPJ stays parquet-only: the keyed factory unwraps straight into the
    // parquet reader; a mixed-format snapshot falls back to normal planning
    val ok = conf.getConf(org.apache.spark.sql.internal.SQLConf.V2_BUCKETING_ENABLED) &&
      spec.fields.nonEmpty && files.nonEmpty &&
      files.forall(p => p.specId == spec.specId &&
        p.file.partition.length == spec.fields.length &&
        p.file.fileFormat == "parquet")
    if (ok) Some(KeyedPartitioning.v2Transforms(table)) else None
  }

  override def outputPartitioning(): org.apache.spark.sql.connector.read.partitioning.Partitioning =
    keyedTransforms match {
      case Some(exprs) =>
        new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
          exprs.toArray[org.apache.spark.sql.connector.expressions.Expression],
          files.map(_.file.partition).distinct.size)
      case None =>
        new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(0)
    }

  override def planInputPartitions(): Array[org.apache.spark.sql.connector.read.InputPartition] = {
    val maxBytes = SparkSession.active.sessionState.conf.filesMaxPartitionBytes
    keyedTransforms match {
      case Some(_) =>
        // one key per partition tuple; packing stays byte-bounded WITHIN a
        // key (Spark groups same-key partitions into one task when a join
        // requires co-partitioning, and reads them independently otherwise)
        currentFiles.groupBy(_.file.partition).toSeq.flatMap { case (pvals, fs) =>
          val key = KeyedPartitioning.keyRow(pvals)
          org.apache.spark.sql.GraftBridge.filePartitions(
            fs.map(p => (p.file.filePath, p.file.fileSizeInBytes)), maxBytes)
            .map(ip => new GraftKeyedPartition(ip, key))
        }.toArray
      case None =>
        // add_files imports (outside location/data, no field ids) pack
        // into their OWN partitions so the reader factory can give them
        // name-based column resolution; orc/avro files pack into
        // format-homogeneous partitions routed to their own readers
        val (nonParquet, parquet) = currentFiles.partition(p =>
          p.file.fileFormat == "orc" || p.file.fileFormat == "avro")
        val (ext, internal) = parquet.partition(isExternal)
        // sorted-scan contract: a partition mixing two sorted files is no
        // longer sorted, so when ordering is reported each file packs
        // alone (its byte-ranges may still split across partitions —
        // slices of a sorted file stay sorted)
        val internalParts =
          if (reportedOrdering.isEmpty)
            org.apache.spark.sql.GraftBridge.filePartitions(
              internal.map(p => (p.file.filePath, p.file.fileSizeInBytes)), maxBytes)
          else internal.flatMap(p =>
            org.apache.spark.sql.GraftBridge.filePartitions(
              Seq((p.file.filePath, p.file.fileSizeInBytes)), maxBytes))
        (internalParts ++
          org.apache.spark.sql.GraftBridge.filePartitions(
            ext.map(p => (p.file.filePath, p.file.fileSizeInBytes)), maxBytes)
            .map(ip => new GraftExternalPartition(ip)) ++
          nonParquet.groupBy(_.file.fileFormat).toSeq.flatMap { case (fmt, fs) =>
            org.apache.spark.sql.GraftBridge.filePartitions(
              fs.map(p => (p.file.filePath, p.file.fileSizeInBytes)), maxBytes)
              .map(ip => new GraftFormatPartition(ip, fmt))
          }).toArray
    }
  }

  /** files outside the table's data dir were registered via add_files:
    * no Iceberg field ids — columns must resolve by NAME */
  private def isExternal(p: PlannedFile): Boolean =
    !graft.tables.Locations.isInternal(
      table.metadata, table.location, p.file.filePath)

  override def createReaderFactory(): org.apache.spark.sql.connector.read.PartitionReaderFactory = {
    val spark = SparkSession.active
    val base = org.apache.spark.sql.GraftBridge.parquetReaderFactory(
      spark, dataSchema, requiredSchema, filters)
    def strip(st: StructType): StructType = StructType(st.fields.map { f =>
      f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(f.metadata).remove(SchemaConvert.FieldIdKey).build())
    })
    // imported files resolve by the table's name mapping when set (each
    // field id reads under the name the files were imported with —
    // rename-safe), else by current name; rows are positional either way
    val extResolve: StructType => StructType =
      graft.tables.NameMapping.of(table.metadata) match {
        case Some(m) => st => graft.tables.NameMapping.toFileNames(m, st)
        case None => strip
      }
    val hasOrc = currentFiles.exists(_.file.fileFormat == "orc")
    val hasAvro = currentFiles.exists(_.file.fileFormat == "avro")
    if (keyedTransforms.isDefined) KeyUnwrapFactory(base)
    else if (!hasOrc && !hasAvro) {
      if (!currentFiles.exists(isExternal)) base
      else ExternalRouteFactory(base,
        org.apache.spark.sql.GraftBridge.parquetReaderFactory(
          spark, extResolve(dataSchema), extResolve(requiredSchema), filters))
    } else {
      val ext =
        if (!currentFiles.exists(isExternal)) null
        else org.apache.spark.sql.GraftBridge.parquetReaderFactory(
          spark, extResolve(dataSchema), extResolve(requiredSchema), filters)
      // ORC resolves by field id when the files carry iceberg.id
      // attributes (rename-safe), by name for legacy/imported files
      val orc =
        if (!hasOrc) null
        else GraftOrcIdFactory(
          org.apache.spark.sql.GraftBridge.orcFactoryBuilder(
            spark, dataSchema, requiredSchema), filters)
      val avro =
        if (!hasAvro) null
        else GraftAvroReaderFactory(requiredSchema,
          new graft.tables.TableWrite.SerializableHadoopConf(
            org.apache.spark.sql.GraftBridge.sessionHadoopConf(spark)))
      // Spark refuses mixed row/columnar partition sets: columnar only
      // when EVERY partition's underlying factory serves batches (avro is
      // row-based, so any avro file flips the whole scan to rows)
      val parts = planInputPartitions()
      val allColumnar = !hasAvro && parts.nonEmpty && parts.forall {
        case f: GraftFormatPartition => orc.supportColumnarReads(f.inner)
        case e: GraftExternalPartition => ext.supportColumnarReads(e.inner)
        case other => base.supportColumnarReads(other)
      }
      FormatRouteFactory(base, ext, orc, avro, allColumnar)
    }
  }

  override def description(): String =
    s"GraftNativeBatchScan(${table.location}, ${currentFiles.size} files after pruning)"

  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new DataFilesMetric)

  override def reportDriverMetrics(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(GraftTaskMetric("graftDataFiles", currentFiles.size.toLong))
}

/** translate DSv2 source filters back into a Column for PruneEval */
object FilterToColumn {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.sources

  def convert(filters: Array[Filter]): Option[SqlColumn] = {
    val cols = filters.flatMap(one)
    if (cols.isEmpty) None else Some(cols.reduce(_ && _))
  }

  /** Exact translation: every filter must convert, else None. Used where
    * the condition is a CONTRACT (filtered overwrite), not an optimization
    * — a dropped conjunct there would delete too many rows. */
  def convertStrict(filters: Array[Filter]): Option[SqlColumn] = {
    val cols = filters.map(oneStrict)
    if (cols.exists(_.isEmpty) || cols.isEmpty) None
    else Some(cols.flatten.reduce(_ && _))
  }

  private def oneStrict(f: Filter): Option[SqlColumn] = f match {
    case sources.IsNull(a) => Some(col(a).isNull)
    case sources.IsNotNull(a) => Some(col(a).isNotNull)
    case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case sources.Not(c) => oneStrict(c).map(!_)
    case sources.And(l, r) => for { a <- oneStrict(l); b <- oneStrict(r) } yield a && b
    case sources.Or(l, r) => for { a <- oneStrict(l); b <- oneStrict(r) } yield a || b
    case sources.StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case sources.EqualTo(_, _) | sources.GreaterThan(_, _) |
        sources.GreaterThanOrEqual(_, _) | sources.LessThan(_, _) |
        sources.LessThanOrEqual(_, _) | sources.In(_, _) => one(f)
    case _ => None
  }

  private def one(f: Filter): Option[SqlColumn] = f match {
    case sources.EqualTo(a, v) => Some(col(a) === lit(v))
    case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sources.LessThan(a, v) => Some(col(a) < lit(v))
    case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case sources.In(a, vs) => Some(col(a).isin(vs.toSeq: _*))
    case sources.And(l, r) =>
      (one(l), one(r)) match {
        case (Some(a), Some(b)) => Some(a && b)
        case (a, b) => a.orElse(b) // partial AND is still a valid prune filter
      }
    case sources.Or(l, r) =>
      for { a <- one(l); b <- one(r) } yield a || b
    case sources.IsNotNull(_) => None // no pruning value
    case _ => None
  }
}

class GraftWriteBuilder(table: GraftTable, writeBranch: Option[String] = None)
    extends WriteBuilder with SupportsTruncate with SupportsOverwrite
    with org.apache.spark.sql.connector.write.SupportsDynamicOverwrite {

  private var overwriteAll = false
  private var overwriteCond: Option[SqlColumn] = None
  private var dynamic = false

  override def truncate(): WriteBuilder = { overwriteAll = true; this }

  /** Static filtered overwrite (`INSERT OVERWRITE t PARTITION (p=1)`):
    * only rows matching the filters are replaced. Filters that cannot be
    * translated exactly are REJECTED — silently widening to a full-table
    * replace would lose every other partition. */
  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    if (filters.isEmpty ||
      filters.forall(_.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue]))
      overwriteAll = true
    else
      overwriteCond = Some(FilterToColumn.convertStrict(filters).getOrElse(
        sys.error(s"unsupported overwrite filters: ${filters.mkString(", ")}")))
    this
  }

  override def overwriteDynamicPartitions(): WriteBuilder = { dynamic = true; this }

  override def build(): Write =
    new GraftWrite(table, overwriteAll, overwriteCond, dynamic, writeBranch)
}

object GraftCatalog {
  /** serializes storage-backend namespace-property read-modify-writes
    * within the JVM (see [[GraftCatalog.alterNamespace]]) */
  private[spark] val nsPropsLock = new Object
}

package graft.spark

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog.{View, ViewInfo}
import org.apache.spark.sql.types.StructType
import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

import graft.tables.{MetadataJson, SchemaConvert}

/** Persisted SQL views for the graft catalog, stored in the Iceberg VIEW
  * spec's metadata shape: one JSON document carrying `view-uuid`,
  * `schemas` (real Iceberg schemas, field ids included), a `versions`
  * list whose entries hold SQL `representations` plus the resolution
  * context (`default-catalog` / `default-namespace`), the
  * `current-version-id` pointer and the `version-log`. CREATE OR REPLACE
  * appends a NEW version (the old definition stays queryable through
  * [[versionsOf]]); a replace whose SQL, schema and context are identical
  * to the current version only refreshes properties instead of minting a
  * version. History is capped by the `version.history.num-entries`
  * property (default 10), trimming oldest versions and their log rows.
  *
  * The document lives at `<view-location>/view.json` — a sibling layout
  * to tables (recognized by their `metadata/` dir, so the two can never
  * be confused) — and every write is write-tmp-then-atomic-rename.
  * Legacy single-version documents (pre-versioning: top-level `sql`) are
  * still readable and upgrade to the versioned shape on first replace.
  *
  * The reference has no view layer (tables only); this is engine surface
  * following the published Iceberg view spec.
  *
  * Known limitation: the stored default-catalog/namespace context is
  * persisted but NOT re-applied at read time (OSS Spark has no way to
  * switch resolution context for a subtree), so view SQL should use
  * catalog-qualified table names. */
object GraftViews {

  private implicit val fmts: Formats = DefaultFormats

  def viewFile(location: String) = new Path(s"$location/view.json")

  def exists(conf: Configuration, location: String): Boolean = {
    val p = viewFile(location)
    p.getFileSystem(conf).exists(p)
  }

  private def parseDoc(conf: Configuration, location: String): JValue = {
    val p = viewFile(location)
    val in = p.getFileSystem(conf).open(p)
    try JsonMethods.parse(in) finally in.close()
  }

  private def strArr(v: JValue): List[String] = v match {
    case JArray(xs) => xs.collect { case JString(s) => s }
    case _ => Nil
  }

  /** one version entry as (id, timestampMs, sql, defaultCatalog,
    * defaultNamespace, schemaId, summary) */
  private def versionTuple(v: JValue) = (
    (v \ "version-id").extract[Int],
    (v \ "timestamp-ms").extract[Long],
    (v \ "representations").children.collectFirst {
      case r if (r \ "type") == JString("sql") => (r \ "sql").extract[String]
    }.getOrElse(sys.error("view version has no sql representation")),
    (v \ "default-catalog").extractOpt[String].getOrElse(""),
    strArr(v \ "default-namespace"),
    (v \ "schema-id").extract[Int],
    (v \ "summary") match {
      case JObject(fs) => fs.collect { case (k, JString(s)) => k -> s }.toMap
      case _ => Map.empty[String, String]
    })

  /** All versions, oldest first: (versionId, timestampMs, sql). */
  def versionsOf(conf: Configuration, location: String): List[(Int, Long, String)] = {
    val doc = parseDoc(conf, location)
    if ((doc \ "versions") == JNothing) // legacy single-version doc
      List((1, 0L, (doc \ "sql").extract[String]))
    else (doc \ "versions").children.map(versionTuple).map(t => (t._1, t._2, t._3))
      .sortBy(_._1)
  }

  /** Upgrade a legacy (pre-versioning) document to the versioned shape. */
  private[spark] def upgraded(doc: JValue, location: String): JValue = {
    if ((doc \ "versions") != JNothing) return doc
    val sql = (doc \ "sql").extract[String]
    val sparkSchema = org.apache.spark.sql.types.DataType
      .fromJson((doc \ "schema").extract[String]).asInstanceOf[StructType]
    val ice = SchemaConvert.fromSparkSchema(sparkSchema)
    val summary: JObject =
      ("query-column-names" -> JsonMethods.compact(JArray(
        strArr(doc \ "query-column-names").map(JString(_))))) ~
        ("column-aliases" -> JsonMethods.compact(JArray(
          strArr(doc \ "column-aliases").map(JString(_))))) ~
        ("column-comments" -> JsonMethods.compact(JArray(
          strArr(doc \ "column-comments").map(JString(_)))))
    ("view-uuid" -> java.util.UUID.randomUUID().toString) ~
      ("format-version" -> 1) ~
      ("location" -> location) ~
      ("current-version-id" -> 1) ~
      ("properties" -> (doc \ "properties")) ~
      ("schemas" -> JArray(List(schemaJsonWithId(ice, 1)))) ~
      ("versions" -> JArray(List(
        ("version-id" -> 1) ~ ("timestamp-ms" -> 0L) ~ ("schema-id" -> 1) ~
          ("summary" -> summary) ~
          ("representations" -> JArray(List(
            ("type" -> "sql") ~ ("sql" -> sql) ~ ("dialect" -> "spark")))) ~
          ("default-catalog" -> (doc \ "current-catalog").extractOpt[String].getOrElse("")) ~
          ("default-namespace" -> JArray(
            strArr(doc \ "current-namespace").map(JString(_))))))) ~
      ("version-log" -> JArray(List(
        ("timestamp-ms" -> 0L) ~ ("version-id" -> 1))))
  }

  def write(conf: Configuration, location: String, info: ViewInfo,
      orReplace: Boolean): Unit = {
    val p = viewFile(location)
    val fs = p.getFileSystem(conf)
    val priorRaw: Option[JValue] =
      if (fs.exists(p)) {
        if (!orReplace) sys.error(s"view already exists at $location")
        Some(upgraded(parseDoc(conf, location), location))
      } else None
    val doc = buildDoc(priorRaw, location, info)
    val bytes = JsonMethods.compact(JsonMethods.render(doc)).getBytes("UTF-8")
    val tmp = new Path(s"$location/.view-${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    // replace must be one atomic rename (no delete-then-rename window in
    // which the view doesn't exist): FileContext supports OVERWRITE
    try {
      org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf).rename(
        tmp, p,
        (if (orReplace) org.apache.hadoop.fs.Options.Rename.OVERWRITE
         else org.apache.hadoop.fs.Options.Rename.NONE))
    } catch {
      case e: Throwable =>
        fs.delete(tmp, false)
        if (!orReplace && fs.exists(p)) sys.error(s"view already exists at $location")
        else throw e
    }
  }

  /** Build the next view-metadata document from the prior one (already
    * version-upgraded) and the new definition — shared by the storage
    * path above and the REST catalog (which ships the document to the
    * server instead of a file). */
  def buildDoc(priorRaw: Option[JValue], location: String, info: ViewInfo): JValue = {
    val now = System.currentTimeMillis()
    val ice = SchemaConvert.fromSparkSchema(info.schema())
    val props: JObject = JObject(
      info.properties().asScala.toList.sortBy(_._1).map { case (k, v) =>
        k -> (JString(v): JValue) })
    val summary: JObject =
      ("query-column-names" -> JsonMethods.compact(JArray(
        info.queryColumnNames().toList.map(JString(_))))) ~
        ("column-aliases" -> JsonMethods.compact(JArray(
          info.columnAliases().toList.map(JString(_))))) ~
        ("column-comments" -> JsonMethods.compact(JArray(
          info.columnComments().toList.map(JString(_)))))

    val doc: JValue = priorRaw match {
      case None =>
        ("view-uuid" -> java.util.UUID.randomUUID().toString) ~
          ("format-version" -> 1) ~
          ("location" -> location) ~
          ("current-version-id" -> 1) ~
          ("properties" -> props) ~
          ("schemas" -> JArray(List(schemaJsonWithId(ice, 1)))) ~
          ("versions" -> JArray(List(versionJson(1, now, 1, summary, info)))) ~
          ("version-log" -> JArray(List(
            ("timestamp-ms" -> now) ~ ("version-id" -> 1))))
      case Some(prior) =>
        val curId = (prior \ "current-version-id").extract[Int]
        val versions = (prior \ "versions").children
        val cur = versions.find(v => (v \ "version-id") == JInt(curId))
        val sameDefinition = cur.exists { v =>
          val (_, _, sql, cat, ns, schemaId, _) = versionTuple(v)
          val priorSchema = (prior \ "schemas").children
            .find(s => (s \ "schema-id") == JInt(schemaId))
          sql == info.sql() && cat == info.currentCatalog() &&
            ns == info.currentNamespace().toList &&
            priorSchema.contains(schemaJsonWithId(ice, schemaId))
        }
        if (sameDefinition)
          // property-only refresh: no new version minted
          prior.asInstanceOf[JObject].copy(obj =
            prior.asInstanceOf[JObject].obj.map {
              case ("properties", _) => ("properties", props: JValue)
              case other => other
            })
        else {
          val nextId = versions.map(v => (v \ "version-id").extract[Int]).max + 1
          val keep = prior match { case o: JObject =>
            (o \ "properties" \ "version.history.num-entries")
              .extractOpt[String].map(_.toInt)
              .orElse(info.properties().asScala.get("version.history.num-entries").map(_.toInt))
              .getOrElse(10)
          }
          val newVersions = (versions :+ versionJson(nextId, now, nextId, summary, info))
            .sortBy(v => (v \ "version-id").extract[Int]).takeRight(math.max(1, keep))
          val keptIds = newVersions.map(v => (v \ "version-id").extract[Int]).toSet
          val keptSchemaIds = newVersions.map(v => (v \ "schema-id").extract[Int]).toSet
          val newSchemas = ((prior \ "schemas").children :+ schemaJsonWithId(ice, nextId))
            .filter(s => keptSchemaIds.contains((s \ "schema-id").extract[Int]))
          val newLog = ((prior \ "version-log").children :+
            (("timestamp-ms" -> now) ~ ("version-id" -> nextId): JValue))
            .filter(l => keptIds.contains((l \ "version-id").extract[Int]))
          ("view-uuid" -> (prior \ "view-uuid").extract[String]) ~
            ("format-version" -> 1) ~
            ("location" -> location) ~
            ("current-version-id" -> nextId) ~
            ("properties" -> props) ~
            ("schemas" -> JArray(newSchemas)) ~
            ("versions" -> JArray(newVersions)) ~
            ("version-log" -> JArray(newLog))
        }
    }
    doc
  }

  private def schemaJsonWithId(ice: graft.tables.IceSchema, id: Int): JValue =
    MetadataJson.schemaToJson(ice.copy(schemaId = id))

  private def versionJson(
      id: Int, now: Long, schemaId: Int, summary: JObject, info: ViewInfo): JValue =
    ("version-id" -> id) ~ ("timestamp-ms" -> now) ~ ("schema-id" -> schemaId) ~
      ("summary" -> summary) ~
      ("representations" -> JArray(List(
        ("type" -> "sql") ~ ("sql" -> info.sql()) ~ ("dialect" -> "spark")))) ~
      ("default-catalog" -> info.currentCatalog()) ~
      ("default-namespace" -> JArray(info.currentNamespace().toList.map(JString(_))))

  def read(conf: Configuration, location: String, viewName: String): View =
    readVersion(conf, location, viewName, None)

  /** Read the view at a specific version id (time travel for views). */
  def readVersion(
      conf: Configuration, location: String, viewName: String,
      versionId: Option[Int]): View = {
    val raw = parseDoc(conf, location)
    viewFromDoc(upgraded(raw, location), viewName, versionId)
  }

  /** Materialize a Spark [[View]] from a (versioned) metadata document —
    * shared by the storage and REST paths. */
  def viewFromDoc(doc: JValue, viewName: String, versionId: Option[Int]): View = {
    val curId = versionId.getOrElse((doc \ "current-version-id").extract[Int])
    val v = (doc \ "versions").children
      .find(x => (x \ "version-id") == JInt(curId))
      .getOrElse(sys.error(s"view $viewName has no version $curId"))
    val (_, _, sql, cat, ns, schemaId, summary) = versionTuple(v)
    val schemaJ = (doc \ "schemas").children
      .find(s => (s \ "schema-id") == JInt(schemaId))
      .getOrElse(sys.error(s"view $viewName: missing schema $schemaId"))
    val sparkSchema = SchemaConvert.toSparkSchema(MetadataJson.parseSchema(schemaJ))
    def summaryArr(key: String): Array[String] =
      summary.get(key).map(s => strArr(JsonMethods.parse(s)).toArray)
        .getOrElse(Array.empty)
    val propsJ = doc \ "properties"
    new View {
      override def name(): String = viewName
      override def query(): String = sql
      override def currentCatalog(): String = cat
      override def currentNamespace(): Array[String] = ns.toArray
      override def schema(): StructType = sparkSchema
      override def queryColumnNames(): Array[String] = summaryArr("query-column-names")
      override def columnAliases(): Array[String] = summaryArr("column-aliases")
      override def columnComments(): Array[String] = summaryArr("column-comments")
      override def properties(): java.util.Map[String, String] = {
        val m = new java.util.LinkedHashMap[String, String]()
        propsJ match {
          case JObject(fs) => fs.foreach {
            case (k, JString(s)) => m.put(k, s)
            case _ =>
          }
          case _ =>
        }
        m
      }
    }
  }

  def drop(conf: Configuration, location: String): Boolean = {
    val p = viewFile(location)
    val fs = p.getFileSystem(conf)
    // delete ONLY the view document, never the directory: a recursive
    // delete would destroy table data if a name collision ever put a
    // view.json beside a table's metadata/ dir
    val dropped = fs.exists(p) && fs.delete(p, false)
    // then clear the dir IF it held nothing but the view doc
    if (dropped) {
      val dir = new Path(location)
      if (fs.exists(dir) && fs.listStatus(dir).isEmpty) fs.delete(dir, false)
    }
    dropped
  }

  /** view identifiers under a namespace dir: dirs with view.json */
  def list(conf: Configuration, nsDir: String): Seq[String] = {
    val dir = new Path(nsDir)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => exists(conf, s"$nsDir/$n")).toSeq
  }
}

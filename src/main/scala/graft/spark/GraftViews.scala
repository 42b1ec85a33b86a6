package graft.spark

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewInfo}
import org.apache.spark.sql.types.{DataType, StructType}

/** Persisted SQL views for the graft catalog: the view definition (SQL
  * text + resolution context + schema) lives as one JSON document at
  * `<view-location>/view.json` — a sibling layout to tables (which are
  * recognized by their `metadata/` dir, so the two can never be confused).
  * Writes are write-tmp-then-rename like every other catalog commit.
  *
  * The reference has no view layer (tables only); this is engine surface
  * in the spirit of the Iceberg view spec: engine-agnostic storage of the
  * query text plus enough context to re-resolve it.
  *
  * Known limitation: the stored current-catalog/current-namespace context
  * is persisted but NOT re-applied at read time (OSS Spark has no way to
  * switch resolution context for a subtree), so view SQL should use
  * catalog-qualified table names; unqualified references resolve against
  * the QUERYING session's context. */
object GraftViews {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def viewFile(location: String) = new Path(s"$location/view.json")

  def exists(conf: Configuration, location: String): Boolean = {
    val p = viewFile(location)
    p.getFileSystem(conf).exists(p)
  }

  def write(conf: Configuration, location: String, info: ViewInfo,
      orReplace: Boolean): Unit = {
    val p = viewFile(location)
    val fs = p.getFileSystem(conf)
    if (!orReplace && fs.exists(p)) sys.error(s"view already exists at $location")
    val doc = new java.util.LinkedHashMap[String, Object]()
    doc.put("name", info.ident().name())
    doc.put("sql", info.sql())
    doc.put("current-catalog", info.currentCatalog())
    doc.put("current-namespace", info.currentNamespace())
    doc.put("schema", info.schema().json)
    doc.put("query-column-names", info.queryColumnNames())
    doc.put("column-aliases", info.columnAliases())
    doc.put("column-comments", info.columnComments())
    doc.put("properties", info.properties())
    val bytes = mapper.writeValueAsBytes(doc)
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

  def read(conf: Configuration, location: String, viewName: String): View = {
    val p = viewFile(location)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    val doc = try mapper.readTree(in) finally in.close()
    def arr(field: String): Array[String] = {
      val n = doc.get(field)
      if (n == null || n.isNull) Array.empty
      else (0 until n.size()).map(i => n.get(i).asText()).toArray
    }
    new View {
      override def name(): String = viewName
      override def query(): String = doc.get("sql").asText()
      override def currentCatalog(): String = doc.get("current-catalog").asText()
      override def currentNamespace(): Array[String] = arr("current-namespace")
      override def schema(): StructType =
        DataType.fromJson(doc.get("schema").asText()).asInstanceOf[StructType]
      override def queryColumnNames(): Array[String] = arr("query-column-names")
      override def columnAliases(): Array[String] = arr("column-aliases")
      override def columnComments(): Array[String] = arr("column-comments")
      override def properties(): java.util.Map[String, String] = {
        val n = doc.get("properties")
        val m = new java.util.LinkedHashMap[String, String]()
        if (n != null && !n.isNull) n.fields().asScala.foreach(e => m.put(e.getKey, e.getValue.asText()))
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

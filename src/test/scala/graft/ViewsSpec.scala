package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Persisted SQL views through the V2 ViewCatalog. */
class ViewsSpec extends AnyFunSuite {

  lazy val spark = {
    val s = TestSpark.spark
    val wh = Files.createTempDirectory("graft-view-wh").toFile.getAbsolutePath
    s.conf.set("spark.sql.catalog.gview", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.gview.warehouse", wh)
    s
  }

  private val sfDir = "/root/testdata/sf0.001"

  private def setup(): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gview.db")
    spark.sql("DROP TABLE IF EXISTS gview.db.vt")
    spark.sql("CREATE TABLE gview.db.vt (r_regionkey INT, r_name STRING)")
    spark.read.parquet(s"$sfDir/region.parquet").createOrReplaceTempView("vsrc")
    spark.sql("INSERT INTO gview.db.vt SELECT * FROM vsrc")
  }

  test("CREATE VIEW / SELECT / SHOW VIEWS / DROP VIEW round-trip") {
    setup()
    spark.sql("DROP VIEW IF EXISTS gview.db.v1")
    spark.sql("CREATE VIEW gview.db.v1 AS SELECT r_name FROM gview.db.vt WHERE r_regionkey < 2")
    assert(spark.table("gview.db.v1").count() === 2)
    // view survives a fresh resolution (definition is re-parsed from disk)
    assert(spark.sql("SELECT * FROM gview.db.v1 ORDER BY r_name").collect()
      .map(_.getString(0)).toSeq === Seq("AFRICA", "AMERICA"))
    val views = spark.sql("SHOW VIEWS IN gview.db").collect().map(_.getString(1))
    assert(views.contains("v1"))
    spark.sql("DROP VIEW gview.db.v1")
    intercept[Exception] { spark.table("gview.db.v1").count() }
  }

  test("view tracks base-table changes (definition, not snapshot)") {
    setup()
    spark.sql("DROP VIEW IF EXISTS gview.db.v2")
    spark.sql("CREATE VIEW gview.db.v2 AS SELECT count(*) AS n FROM gview.db.vt")
    assert(spark.table("gview.db.v2").collect().head.getLong(0) === 5)
    spark.sql("INSERT INTO gview.db.vt SELECT * FROM vsrc")
    assert(spark.table("gview.db.v2").collect().head.getLong(0) === 10)
  }

  test("DROP VIEW never deletes table data; name collisions are rejected") {
    setup()
    // view name colliding with an existing table is rejected both ways
    intercept[Exception] {
      spark.sql("CREATE VIEW gview.db.vt AS SELECT 1 AS one")
    }
    intercept[Exception] {
      spark.sql("CREATE OR REPLACE VIEW gview.db.vt AS SELECT 1 AS one")
    }
    // table creation over an existing view is rejected
    spark.sql("CREATE OR REPLACE VIEW gview.db.vguard AS SELECT 1 AS one")
    intercept[Exception] {
      spark.sql("CREATE TABLE gview.db.vguard (x INT)")
    }
    intercept[Exception] {
      spark.sql("CREATE TABLE gview.db.vguard AS SELECT 2 AS two")
    }
    spark.sql("DROP VIEW gview.db.vguard")
    // and the table is still fully readable
    assert(spark.table("gview.db.vt").count() === 5)
  }

  test("recursive views fail with a clear error, not max-iterations") {
    setup()
    spark.sql("CREATE OR REPLACE VIEW gview.db.c1 AS SELECT r_name FROM gview.db.vt")
    spark.sql("CREATE OR REPLACE VIEW gview.db.c2 AS SELECT r_name FROM gview.db.c1")
    // re-pointing c1 at c2 closes the cycle (analysis at create time sees
    // the OLD c1 through c2, so the replace itself succeeds)
    spark.sql("CREATE OR REPLACE VIEW gview.db.c1 AS SELECT r_name FROM gview.db.c2")
    val err = intercept[Exception] { spark.table("gview.db.c1").count() }
    assert(err.getMessage.contains("recursive view"),
      s"expected recursive-view error, got: ${err.getMessage}")
    spark.sql("DROP VIEW gview.db.c1")
    spark.sql("DROP VIEW gview.db.c2")
  }

  test("persisted views cannot capture temp views") {
    setup()
    val err = intercept[Exception] {
      spark.sql("CREATE VIEW gview.db.vtmp AS SELECT * FROM vsrc")
    }
    assert(err.getMessage.contains("temporary view"),
      s"expected temp-view rejection, got: ${err.getMessage}")
  }

  test("temp views hiding inside subquery expressions are rejected too") {
    setup()
    val err = intercept[Exception] {
      spark.sql("CREATE VIEW gview.db.vsub AS SELECT r_name FROM gview.db.vt t " +
        "WHERE EXISTS (SELECT 1 FROM vsrc s WHERE s.r_regionkey = t.r_regionkey)")
    }
    assert(err.getMessage.contains("temporary view"),
      s"expected temp-view rejection, got: ${err.getMessage}")
  }

  test("ALTER VIEW RENAME refuses an identifier occupied by a table") {
    setup()
    spark.sql("CREATE OR REPLACE VIEW gview.db.vren AS SELECT r_name FROM gview.db.vt")
    val err = intercept[Exception] {
      spark.sql("ALTER VIEW gview.db.vren RENAME TO gview.db.vt")
    }
    assert(err.getMessage.contains("table already exists"),
      s"expected collision rejection, got: ${err.getMessage}")
    // the view is untouched by the failed rename
    assert(spark.table("gview.db.vren").count() === 5)
    // and a rename to a free identifier works end to end
    spark.sql("DROP VIEW IF EXISTS gview.db.vren2")
    spark.sql("ALTER VIEW gview.db.vren RENAME TO gview.db.vren2")
    assert(spark.table("gview.db.vren2").count() === 5)
    intercept[Exception] { spark.table("gview.db.vren").count() }
    spark.sql("DROP VIEW gview.db.vren2")
  }

  test("ALTER VIEW SET/UNSET TBLPROPERTIES persists through the catalog") {
    setup()
    spark.sql("CREATE OR REPLACE VIEW gview.db.vp AS SELECT r_name FROM gview.db.vt")
    spark.sql("ALTER VIEW gview.db.vp SET TBLPROPERTIES ('steward' = 'etl', 'tier' = 'gold')")
    val cat = spark.sessionState.catalogManager.catalog("gview")
      .asInstanceOf[graft.spark.GraftCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "vp")
    assert(cat.loadView(ident).properties().get("steward") === "etl")
    spark.sql("ALTER VIEW gview.db.vp UNSET TBLPROPERTIES ('steward')")
    val props = cat.loadView(ident).properties()
    assert(!props.containsKey("steward") && props.get("tier") === "gold")
    // definition untouched by property changes
    assert(spark.table("gview.db.vp").count() === 5)
  }

  test("CREATE OR REPLACE VIEW swaps the definition") {
    setup()
    spark.sql("CREATE OR REPLACE VIEW gview.db.v3 AS SELECT r_name FROM gview.db.vt")
    assert(spark.table("gview.db.v3").count() === 5)
    spark.sql("CREATE OR REPLACE VIEW gview.db.v3 AS SELECT r_name FROM gview.db.vt WHERE r_regionkey = 0")
    assert(spark.table("gview.db.v3").count() === 1)
  }

  private def conf = spark.sparkContext.hadoopConfiguration
  private def locOf(name: String): String =
    s"${spark.conf.get("spark.sql.catalog.gview.warehouse")}/db/$name"

  test("replace appends a version; old definitions stay readable") {
    setup()
    spark.sql("DROP VIEW IF EXISTS gview.db.vv")
    spark.sql("CREATE VIEW gview.db.vv AS SELECT r_name FROM gview.db.vt")
    spark.sql("CREATE OR REPLACE VIEW gview.db.vv AS SELECT r_name FROM gview.db.vt WHERE r_regionkey < 2")
    spark.sql("CREATE OR REPLACE VIEW gview.db.vv AS SELECT r_regionkey FROM gview.db.vt")
    val versions = graft.spark.GraftViews.versionsOf(conf, locOf("vv"))
    assert(versions.map(_._1) === List(1, 2, 3))
    assert(versions.map(_._3).distinct.size === 3) // three distinct SQLs
    // version time travel: read the middle definition
    val v2 = graft.spark.GraftViews.readVersion(conf, locOf("vv"), "vv", Some(2))
    assert(v2.query().contains("r_regionkey < 2"))
    assert(v2.schema().fieldNames.toSeq === Seq("r_name"))
    // current resolves to version 3
    assert(spark.table("gview.db.vv").schema.fieldNames.toSeq === Seq("r_regionkey"))
  }

  test("property-only ALTER does not mint a version") {
    setup()
    spark.sql("DROP VIEW IF EXISTS gview.db.vprop")
    spark.sql("CREATE VIEW gview.db.vprop AS SELECT r_name FROM gview.db.vt")
    val before = graft.spark.GraftViews.versionsOf(conf, locOf("vprop")).size
    spark.sql("ALTER VIEW gview.db.vprop SET TBLPROPERTIES ('tier' = 'gold')")
    val after = graft.spark.GraftViews.versionsOf(conf, locOf("vprop"))
    assert(after.size === before)
    val cat = spark.sessionState.catalogManager.catalog("gview")
      .asInstanceOf[graft.spark.GraftCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "vprop")
    assert(cat.loadView(ident).properties().get("tier") === "gold")
  }

  test("version history is capped by version.history.num-entries") {
    setup()
    spark.sql("DROP VIEW IF EXISTS gview.db.vcap")
    spark.sql("""CREATE VIEW gview.db.vcap
      TBLPROPERTIES ('version.history.num-entries' = '3')
      AS SELECT r_name FROM gview.db.vt""")
    (0 until 5).foreach { i =>
      spark.sql(s"""CREATE OR REPLACE VIEW gview.db.vcap
        TBLPROPERTIES ('version.history.num-entries' = '3')
        AS SELECT r_name FROM gview.db.vt WHERE r_regionkey <= $i""")
    }
    val versions = graft.spark.GraftViews.versionsOf(conf, locOf("vcap"))
    assert(versions.size === 3)
    assert(versions.map(_._1) === List(4, 5, 6)) // oldest trimmed
    assert(spark.table("gview.db.vcap").count() === 5) // current = <= 4
  }

  test("views through the REST catalog: round-trip, versions, rename, drop") {
    val server = new graft.tables.RestCatalog.Server()
    val uri = server.start()
    val wh = Files.createTempDirectory("graft-grv-wh").toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.grv", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.grv.uri", uri)
    spark.conf.set("spark.sql.catalog.grv.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS grv.db")
      spark.sql("CREATE TABLE grv.db.t (k INT, v STRING)")
      spark.sql("INSERT INTO grv.db.t VALUES (1, 'a'), (2, 'b')")
      spark.sql("CREATE VIEW grv.db.rv AS SELECT v FROM grv.db.t WHERE k = 1")
      assert(spark.table("grv.db.rv").collect().map(_.getString(0)).toSeq === Seq("a"))
      // replace appends a version ON THE SERVER
      spark.sql("CREATE OR REPLACE VIEW grv.db.rv AS SELECT v FROM grv.db.t")
      assert(spark.table("grv.db.rv").count() === 2)
      val client = new graft.tables.RestCatalog.Client(uri, conf)
      val doc = client.loadViewDoc("db", "rv")
      import org.json4s._
      assert((doc \ "versions").children.size === 2)
      assert((doc \ "current-version-id") === JInt(2))
      // listing + property alter through REST
      assert(spark.sql("SHOW VIEWS IN grv.db").collect().map(_.getString(1)).contains("rv"))
      spark.sql("ALTER VIEW grv.db.rv SET TBLPROPERTIES ('tier' = 'gold')")
      val cat = spark.sessionState.catalogManager.catalog("grv")
        .asInstanceOf[graft.spark.GraftCatalog]
      val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "rv")
      assert(cat.loadView(ident).properties().get("tier") === "gold")
      assert((client.loadViewDoc("db", "rv") \ "versions").children.size === 2)
      // rename keeps the version history (server-side pointer move)
      val ident2 = org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "rv2")
      cat.renameView(ident, ident2)
      assert(!cat.viewExists(ident) && cat.viewExists(ident2))
      assert((client.loadViewDoc("db", "rv2") \ "versions").children.size === 2)
      assert(spark.table("grv.db.rv2").count() === 2)
      spark.sql("DROP VIEW grv.db.rv2")
      assert(!cat.viewExists(ident2))
    } finally {
      server.stop()
      spark.conf.unset("spark.sql.catalog.grv")
      spark.conf.unset("spark.sql.catalog.grv.uri")
      spark.conf.unset("spark.sql.catalog.grv.warehouse")
    }
  }

  test("legacy single-version documents read and upgrade on replace") {
    setup()
    // hand-write the PRE-versioning document shape
    val loc = locOf("vlegacy")
    val fs = new org.apache.hadoop.fs.Path(loc).getFileSystem(conf)
    fs.mkdirs(new org.apache.hadoop.fs.Path(loc))
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("r_name",
        org.apache.spark.sql.types.StringType))).json
    val legacy = s"""{"name":"vlegacy",
      "sql":"SELECT r_name FROM gview.db.vt",
      "current-catalog":"gview","current-namespace":["db"],
      "schema":${com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
        .writeValueAsString(schemaJson)},
      "query-column-names":[],"column-aliases":[],"column-comments":[],
      "properties":{}}"""
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$loc/view.json"), true)
    try out.write(legacy.getBytes("UTF-8")) finally out.close()
    assert(spark.table("gview.db.vlegacy").count() === 5)
    spark.sql("CREATE OR REPLACE VIEW gview.db.vlegacy AS SELECT r_regionkey FROM gview.db.vt")
    val versions = graft.spark.GraftViews.versionsOf(conf, locOf("vlegacy"))
    assert(versions.map(_._1) === List(1, 2)) // legacy became version 1
    assert(spark.table("gview.db.vlegacy").schema.fieldNames.toSeq === Seq("r_regionkey"))
  }
}

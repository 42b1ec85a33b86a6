package graft

import java.io.{BufferedReader, InputStreamReader}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

import graft.tables._

/** REST catalog conformance against a genuinely OUT-OF-PROCESS server:
  * the in-process matrix (MaintenanceSpec) can't see socket-level
  * behavior or header handling, so this spec forks the server into its
  * own JVM and drives pagination, CAS conflicts, error bodies, and
  * bearer-token auth over real HTTP. */
class RestForkedSpec extends AnyFunSuite {

  private def tmpLocation(name: String): String = {
    val d = Files.createTempDirectory(s"graft-$name").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def freshMeta(loc: String): TableMetadata = {
    val schema = IceSchema(0, List(
      IceField(1, "id", required = false, IcePrim("long")),
      IceField(2, "v", required = false, IcePrim("string"))))
    TableMetadata(
      formatVersion = 2, tableUuid = java.util.UUID.randomUUID().toString,
      location = loc, lastSequenceNumber = 0,
      lastUpdatedMs = System.currentTimeMillis(),
      lastColumnId = schema.maxFieldId, schemas = List(schema),
      currentSchemaId = 0, partitionSpecs = List(IcePartitionSpec(0, Nil)),
      defaultSpecId = 0, lastPartitionId = 999, properties = Map.empty,
      currentSnapshotId = None, snapshots = Nil, snapshotLog = Nil,
      metadataLog = Nil, sortOrders = List(IceSortOrder(0, Nil)),
      defaultSortOrderId = 0, refs = Map.empty)
  }

  test("REST conformance over a real socket: auth, paging, CAS, error bodies") {
    val java = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    val proc = new ProcessBuilder(
      java, "-cp", cp, "graft.tables.RestServerMain", "2", "sekrit")
      .redirectErrorStream(true).start()
    val reader = new BufferedReader(new InputStreamReader(proc.getInputStream))
    var uri: String = null
    val deadline = System.currentTimeMillis() + 60000
    while (uri == null && System.currentTimeMillis() < deadline && proc.isAlive) {
      val line = reader.readLine()
      if (line != null && line.startsWith("REST_URI=")) uri = line.stripPrefix("REST_URI=")
    }
    assert(uri != null, "forked REST server did not start in time")
    try {
      val http = HttpClient.newHttpClient()
      def raw(path: String, auth: Option[String]): HttpResponse[String] = {
        val b = HttpRequest.newBuilder(URI.create(s"$uri$path")).GET()
        auth.foreach(t => b.header("Authorization", s"Bearer $t"))
        http.send(b.build(), HttpResponse.BodyHandlers.ofString())
      }

      // no/wrong credentials -> spec-shaped 401, nothing leaks
      val unauth = raw("/v1/config", None)
      assert(unauth.statusCode() === 401)
      val uj = org.json4s.jackson.JsonMethods.parse(unauth.body()) \ "error"
      assert((uj \ "type") === org.json4s.JString("NotAuthorizedException"))
      assert((uj \ "code") === org.json4s.JInt(401))
      assert(raw("/v1/config", Some("wrong")).statusCode() === 401)
      // an unauthenticated Client fails fast rather than mis-reading
      intercept[Exception] { new RestCatalog.Client(uri, new Configuration()).config() }

      // authorized client: token from conf rides every request
      val conf = new Configuration()
      conf.set("graft.rest.token", "sekrit")
      val client = new RestCatalog.Client(uri, conf)
      client.config()
      client.createNamespace("cf")
      (1 to 5).foreach(i => client.createTable("cf", s"t$i", freshMeta(tmpLocation(s"rfk$i"))))

      // pagination across the socket (server pages of 2, client walks
      // next-page-token to exhaustion)
      assert(client.listTables("cf") === (1 to 5).map(i => s"t$i"))
      val page1 = org.json4s.jackson.JsonMethods.parse(
        raw("/v1/namespaces/cf/tables", Some("sekrit")).body())
      assert((page1 \ "identifiers").children.size === 2)
      assert((page1 \ "next-page-token").isInstanceOf[org.json4s.JString])

      // CAS conflict over the socket: stale expected version -> 409 ->
      // typed conflict, not a silent overwrite
      val t1 = client.loadTable("cf", "t1")
      intercept[CommitConflictException] {
        client.commitTable("cf", "t1", t1.version + 7, t1.metadata)
      }
      // and a well-formed commit at the right version lands
      val v2 = client.commitTable("cf", "t1", t1.version, t1.metadata)
      assert(v2 === t1.version + 1)

      // spec-shaped 404 body for a missing table
      val missing = raw("/v1/namespaces/cf/tables/nope", Some("sekrit"))
      assert(missing.statusCode() === 404)
      val mj = org.json4s.jackson.JsonMethods.parse(missing.body()) \ "error"
      assert((mj \ "type") === org.json4s.JString("NoSuchTableException"))
    } finally {
      proc.destroyForcibly()
      proc.waitFor()
    }
  }

  test("multi-table transaction: all-or-nothing commit") {
    val server = new RestCatalog.Server()
    val uri = server.start()
    try {
      val client = new RestCatalog.Client(uri, new Configuration(false))
      client.createNamespace("db")
      val m1 = freshMeta(tmpLocation("txn-a"))
      val m2 = freshMeta(tmpLocation("txn-b"))
      client.createTable("db", "a", m1)
      client.createTable("db", "b", m2)
      // both tables advance in ONE atomic commit
      val v = client.commitTransaction(Seq(
        ("db", "a", 1, m1.copy(properties = Map("k" -> "1"))),
        ("db", "b", 1, m2.copy(properties = Map("k" -> "1")))))
      assert(v === Map("db.a" -> 2, "db.b" -> 2))
      // ONE stale requirement fails the WHOLE transaction: b's version is
      // stale, so a's update must not land either
      intercept[CommitConflictException] {
        client.commitTransaction(Seq(
          ("db", "a", 2, m1.copy(properties = Map("k" -> "2"))),
          ("db", "b", 1, m2.copy(properties = Map("k" -> "2")))))
      }
      val a = client.loadTable("db", "a")
      assert(a.version === 2)
      assert(a.metadata.properties.get("k") === Some("1"))
      // a uuid requirement mismatch (table swapped underneath) refuses too
      intercept[CommitConflictException] {
        client.commitTransaction(Seq(
          ("db", "a", 2, m1.copy(
            tableUuid = java.util.UUID.randomUUID().toString,
            properties = Map("k" -> "3")))))
      }
      assert(client.loadTable("db", "a").metadata.properties.get("k") === Some("1"))
    } finally server.stop()
  }

  test("transactions serialize against racing single-table commits") {
    val server = new RestCatalog.Server()
    val uri = server.start()
    try {
      val client = new RestCatalog.Client(uri, new Configuration(false))
      client.createNamespace("race")
      val m1 = freshMeta(tmpLocation("race-a"))
      val m2 = freshMeta(tmpLocation("race-b"))
      client.createTable("race", "a", m1)
      client.createTable("race", "b", m2)
      val singles = new java.util.concurrent.atomic.AtomicInteger(0)
      val txns = new java.util.concurrent.atomic.AtomicInteger(0)
      val threads = (0 until 4).map { i =>
        new Thread(() => {
          (0 until 10).foreach { _ =>
            try {
              if (i % 2 == 0) {
                // single-table commit on a at its CURRENT version
                val cur = client.loadTable("race", "a")
                client.commitTable("race", "a", cur.version, cur.metadata)
                singles.incrementAndGet()
              } else {
                // transaction advancing BOTH at their current versions
                val ca = client.loadTable("race", "a")
                val cb = client.loadTable("race", "b")
                client.commitTransaction(Seq(
                  ("race", "a", ca.version, ca.metadata),
                  ("race", "b", cb.version, cb.metadata)))
                txns.incrementAndGet()
              }
            } catch { case _: CommitConflictException => /* lost the race */ }
          }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      // serializability invariant: a advanced once per success of either
      // kind, b once per successful transaction — no lost updates, no
      // partial transactions
      val va = client.loadTable("race", "a").version
      val vb = client.loadTable("race", "b").version
      assert(va === 1 + singles.get + txns.get)
      assert(vb === 1 + txns.get)
      assert(singles.get + txns.get > 0) // the race actually ran
    } finally server.stop()
  }

  test("OAuth2 client-credentials: token exchange gates the catalog") {
    val server = new RestCatalog.Server(credential = Some("svc:oauth-secret"))
    val uri = server.start()
    try {
      // no credentials at all -> spec-shaped 401 on any catalog call
      val bare = new RestCatalog.Client(
        uri, new org.apache.hadoop.conf.Configuration(false))
      val e1 = intercept[IllegalArgumentException] { bare.createNamespace("db") }
      assert(e1.getMessage.contains("401"))
      // wrong secret -> the EXCHANGE itself fails with 401
      val badConf = new org.apache.hadoop.conf.Configuration(false)
      badConf.set("graft.rest.credential", "svc:wrong")
      val e2 = intercept[IllegalArgumentException] {
        new RestCatalog.Client(uri, badConf).createNamespace("db")
      }
      assert(e2.getMessage.contains("oauth token exchange failed"))
      // right credential: exchanged once, then the minted bearer rides
      // every request — full namespace round-trip works
      val goodConf = new org.apache.hadoop.conf.Configuration(false)
      goodConf.set("graft.rest.credential", "svc:oauth-secret")
      val client = new RestCatalog.Client(uri, goodConf)
      client.createNamespace("db", Map("team" -> "ml"))
      assert(client.namespaceExists("db"))
      assert(client.namespaceProperties("db") === Map("team" -> "ml"))
      client.updateNamespaceProperties("db", Map("team" -> "infra"), Nil)
      assert(client.namespaceProperties("db") === Map("team" -> "infra"))
      // a static token config still wins and is rejected if bogus
      val staticConf = new org.apache.hadoop.conf.Configuration(false)
      staticConf.set("graft.rest.token", "not-a-minted-token")
      staticConf.set("graft.rest.credential", "svc:oauth-secret")
      val e3 = intercept[IllegalArgumentException] {
        new RestCatalog.Client(uri, staticConf).createNamespace("db2")
      }
      assert(e3.getMessage.contains("401"))
    } finally server.stop()
  }

  test("OAuth2 lifecycle: 401 re-mints once; advertised expiry re-exchanges") {
    // 1) server-side revocation mid-session (catalog restart / real
    //    expiry): the client's next request 401s, transparently re-mints,
    //    and succeeds — a long-lived streaming job never sees the 401
    val server = new RestCatalog.Server(credential = Some("svc:s3cr3t"))
    val uri = server.start()
    try {
      val conf = new org.apache.hadoop.conf.Configuration(false)
      conf.set("graft.rest.credential", "svc:s3cr3t")
      val client = new RestCatalog.Client(uri, conf)
      client.createNamespace("db")
      assert(server.mintedCount === 1)
      server.revokeTokens() // every outstanding bearer now 401s
      assert(client.namespaceExists("db")) // transparent re-mint + retry
      assert(server.mintedCount === 2)
      // the re-minted token is then CACHED (no per-request exchange)
      assert(client.namespaceProperties("db") === Map.empty)
      assert(server.mintedCount === 2)
    } finally server.stop()

    // 2) expiry honoring: a token advertised as already-inside-the-refresh-
    //    margin is never reused — each call re-exchanges BEFORE sending,
    //    so no request ever rides an expired bearer
    val fast = new RestCatalog.Server(
      credential = Some("svc:s3cr3t"), tokenExpiresInSec = 30L) // < 60 s margin
    val fastUri = fast.start()
    try {
      val conf = new org.apache.hadoop.conf.Configuration(false)
      conf.set("graft.rest.credential", "svc:s3cr3t")
      val client = new RestCatalog.Client(fastUri, conf)
      client.createNamespace("db")
      assert(client.namespaceExists("db"))
      assert(fast.mintedCount >= 2, "near-expiry tokens must re-exchange")
    } finally fast.stop()
  }
}

package graft.tables

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.hadoop.conf.Configuration
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Iceberg-REST-shaped catalog protocol (the reference's second catalog,
  * icelake/src/catalog/rest.rs:71-148): table metadata lives behind HTTP
  * endpoints with optimistic (compare-and-swap) commits; data/manifest
  * files stay on shared storage.
  *
  * Endpoints (subset):
  *   GET  /v1/config
  *   GET  /v1/namespaces/{ns}/tables/{table}    -> load
  *   POST /v1/namespaces/{ns}/tables            -> create
  *   POST /v1/namespaces/{ns}/tables/{table}    -> commit (requirements+metadata)
  *   POST /v1/namespaces/{ns}/register          -> register existing metadata file
  */
object RestCatalog {

  // ---------------- client ----------------

  class Client(baseUri: String, conf: Configuration) {
    private val http = HttpClient.newHttpClient()

    /** OAuth2 client-credentials token, exchanged at the spec's
      * `POST /v1/oauth/tokens` when `graft.rest.credential` is set to
      * `<client_id>:<client_secret>` (form-encoded grant, scope
      * `catalog`). A static `graft.rest.token` wins when both are set.
      *
      * LIFECYCLE: the response's `expires_in` (seconds) is honored — the
      * cached token re-exchanges [[OauthRefreshMarginMs]] before expiry,
      * so a streaming job outliving its first token keeps authenticating;
      * and any 401 on a normal request clears the cache and retries ONCE
      * with a freshly minted token (revocation / server restart). */
    @volatile private var oauthToken: Option[(String, Long)] = None

    /** re-mint this long before the advertised expiry */
    private val OauthRefreshMarginMs = 60000L

    private def fetchOauthToken(cred: String): (String, Long) = {
      val Array(id, secret) = cred.split(":", 2)
      def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
      val form = s"grant_type=client_credentials&client_id=${enc(id)}" +
        s"&client_secret=${enc(secret)}&scope=catalog"
      val req = HttpRequest.newBuilder(URI.create(s"$baseUri/v1/oauth/tokens"))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString(form, StandardCharsets.UTF_8))
        .build()
      val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
      require(resp.statusCode() == 200,
        s"oauth token exchange failed: ${resp.statusCode()} ${errMsg(resp.body())}")
      val j = JsonMethods.parse(resp.body())
      val token = (j \ "access_token") match {
        case JString(t) => t
        case _ => sys.error("oauth response missing access_token")
      }
      val expiresAt = (j \ "expires_in") match {
        case JInt(s) => System.currentTimeMillis() + s.toLong * 1000L
        case JLong(s) => System.currentTimeMillis() + s * 1000L
        case _ => Long.MaxValue // no advertised expiry: cache until a 401
      }
      (token, expiresAt)
    }

    /** true when auth flows through minted OAuth tokens (the only mode
      * where a 401-retry re-mint can help) */
    private def usesOauth: Boolean =
      Option(conf.get("graft.rest.token")).filter(_.nonEmpty).isEmpty &&
        Option(conf.get("graft.rest.credential")).exists(_.contains(":"))

    private[tables] def invalidateOauthToken(): Unit = oauthToken = None

    private def bearerToken(): Option[String] =
      Option(conf.get("graft.rest.token")).filter(_.nonEmpty).orElse(
        Option(conf.get("graft.rest.credential")).filter(_.contains(":"))
          .map { cred =>
            def live(t: Option[(String, Long)]): Option[String] = t.collect {
              case (tok, exp)
                  if System.currentTimeMillis() < exp - OauthRefreshMarginMs => tok
            }
            live(oauthToken).getOrElse(this.synchronized {
              live(oauthToken).getOrElse {
                val t = fetchOauthToken(cred)
                oauthToken = Some(t)
                t._1
              }
            })
          })

    /** sends a request; on a 401 under OAuth the cached token is dropped
      * and the request rebuilt (fresh bearer) and retried exactly once */
    private def sendAuth(mk: => HttpRequest): HttpResponse[String] = {
      val resp = http.send(mk, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() == 401 && usesOauth) {
        invalidateOauthToken()
        http.send(mk, HttpResponse.BodyHandlers.ofString())
      } else resp
    }

    /** request builder with credential pass-through: a bearer token
      * (static `graft.rest.token`, or one exchanged via OAuth2 from
      * `graft.rest.credential`) rides every request as
      * `Authorization: Bearer <token>` */
    private def rb(path: String): HttpRequest.Builder = {
      val b = HttpRequest.newBuilder(URI.create(s"$baseUri$path"))
      bearerToken().foreach(t => b.header("Authorization", s"Bearer $t"))
      b
    }

    private def get(path: String): (Int, String) = {
      val resp = sendAuth(rb(path).GET().build())
      (resp.statusCode(), resp.body())
    }

    private def post(path: String, body: String): (Int, String) = {
      val resp = sendAuth(rb(path)
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
        .build())
      (resp.statusCode(), resp.body())
    }

    def config(): Map[String, String] = {
      val (code, body) = get("/v1/config")
      require(code == 200, s"config failed: $code")
      JsonMethods.parse(body) \ "defaults" match {
        case JObject(fields) => fields.collect { case (k, JString(v)) => k -> v }.toMap
        case _ => Map.empty
      }
    }

    def loadTable(ns: String, name: String): GraftTable = {
      val (code, body) = get(s"/v1/namespaces/${nsPath(ns)}/tables/$name")
      if (code == 404) throw new NoSuchElementException(s"no table $ns.$name")
      require(code == 200, s"load failed: $code ${errMsg(body)}")
      val j = JsonMethods.parse(body)
      val meta = MetadataJson.parse(
        JsonMethods.compact(JsonMethods.render(j \ "metadata")).getBytes("UTF-8"))
      val version = (j \ "version") match {
        case JInt(v) => v.toInt
        case JLong(v) => v.toInt
        case _ => 1
      }
      wire(ns, name, new GraftTable(meta.location, meta, version, conf))
    }

    def createTable(ns: String, name: String, meta: TableMetadata): GraftTable = {
      val body =
        s"""{"name": ${quote(name)}, "metadata": ${new String(MetadataJson.serialize(meta), "UTF-8")}}"""
      val (code, respBody) = post(s"/v1/namespaces/${nsPath(ns)}/tables", body)
      require(code == 200, s"create failed: $code ${errMsg(respBody)}")
      wire(ns, name, new GraftTable(meta.location, meta, 1, conf))
    }

    /** Iceberg-REST `register`: attach an EXISTING table — its current
      * metadata file, wherever it lives — under a new catalog identifier.
      * Nothing is copied or rewritten; the server reads the metadata file
      * and serves it as version 1, and future commits CAS through the
      * catalog as usual while data/manifest paths keep pointing at the
      * original location. */
    def registerTable(ns: String, name: String, metadataLocation: String): GraftTable = {
      val (code, body) = post(s"/v1/namespaces/${nsPath(ns)}/register",
        s"""{"name": ${quote(name)}, "metadata-location": ${quote(metadataLocation)}}""")
      require(code == 200, s"register $ns.$name failed: HTTP $code ${errMsg(body)}")
      val j = JsonMethods.parse(body)
      val meta = MetadataJson.parse(
        JsonMethods.compact(JsonMethods.render(j \ "metadata")).getBytes("UTF-8"))
      wire(ns, name, new GraftTable(meta.location, meta, 1, conf))
    }

    /** CAS commit: requirements carry the expected version + current main
      * ref; 409 means another writer won. */
    def commitTable(ns: String, name: String, expectedVersion: Int, meta: TableMetadata): Int = {
      val reqs =
        s"""[{"type": "assert-table-uuid", "uuid": ${quote(meta.tableUuid)}},
           | {"type": "assert-version", "version": $expectedVersion}]""".stripMargin
      val body =
        s"""{"requirements": $reqs, "metadata": ${new String(MetadataJson.serialize(meta), "UTF-8")}}"""
      val (code, respBody) = post(s"/v1/namespaces/${nsPath(ns)}/tables/$name", body)
      if (code == 409) throw new CommitConflictException(s"rest commit conflict: ${errMsg(respBody)}")
      require(code == 200, s"commit failed: $code ${errMsg(respBody)}")
      (JsonMethods.parse(respBody) \ "version") match {
        case JInt(v) => v.toInt
        case JLong(v) => v.toInt
        case _ => expectedVersion + 1
      }
    }

    /** Atomic MULTI-TABLE commit (the Iceberg REST CommitTransaction
      * shape): every change carries its own requirements; the server
      * validates all of them against current state and applies all or
      * none. The cross-table consistency primitive (e.g. publishing a
      * consistent snapshot across fact + dim tables). Returns
      * `ns.table -> new version`. */
    def commitTransaction(
        changes: Seq[(String, String, Int, TableMetadata)]): Map[String, Int] = {
      val body = changes.map { case (ns, name, expected, meta) =>
        val nsArr = ns.split('.').map(quote).mkString("[", ", ", "]")
        s"""{"identifier": {"namespace": $nsArr, "name": ${quote(name)}},
           | "requirements": [
           |  {"type": "assert-table-uuid", "uuid": ${quote(meta.tableUuid)}},
           |  {"type": "assert-version", "version": $expected}],
           | "metadata": ${new String(MetadataJson.serialize(meta), "UTF-8")}}""".stripMargin
      }.mkString("""{"table-changes": [""", ", ", "]}")
      val (code, resp) = post("/v1/transactions/commit", body)
      if (code == 409)
        throw new CommitConflictException(s"transaction conflict: ${errMsg(resp)}")
      require(code == 200, s"transaction failed: $code ${errMsg(resp)}")
      (JsonMethods.parse(resp) \ "versions") match {
        case JObject(kv) => kv.collect {
          case (k, JInt(v)) => k -> v.toInt
          case (k, JLong(v)) => k -> v.toInt
        }.toMap
        case _ => Map.empty
      }
    }

    def dropTable(ns: String, name: String): Unit = {
      val resp = sendAuth(
        rb(s"/v1/namespaces/${nsPath(ns)}/tables/$name").DELETE().build())
      // a failed catalog-side drop must NOT look like success — callers
      // delete the data directory afterwards (404 = already gone, fine)
      require(resp.statusCode() == 200 || resp.statusCode() == 404,
        s"drop table failed: ${resp.statusCode()} ${resp.body()}")
    }

    /** follows `next-page-token` until the listing is exhausted (the
      * server may bound each page; one response is NOT the full answer) */
    def listTables(ns: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      var token: Option[String] = Some("")
      while (token.isDefined) {
        val q = token.filter(_.nonEmpty).map(t => s"?pageToken=$t").getOrElse("")
        val (code, body) = get(s"/v1/namespaces/${nsPath(ns)}/tables$q")
        if (code != 200) return out.result()
        val j = JsonMethods.parse(body)
        out ++= (j \ "identifiers").children.flatMap(_ \ "name" match {
          case JString(s) => Some(s)
          case _ => None
        })
        token = (j \ "next-page-token") match {
          case JString(t) if t.nonEmpty => Some(t)
          case _ => None
        }
      }
      out.result()
    }

    // ----- views (Iceberg REST view endpoints: the catalog stores the
    // versioned view-metadata document; the engine builds/reads it with
    // the same code as the storage catalog) -----

    def loadViewDoc(ns: String, name: String): JValue = {
      val (code, body) = get(s"/v1/namespaces/${nsPath(ns)}/views/$name")
      if (code == 404) throw new NoSuchElementException(s"no view $ns.$name")
      require(code == 200, s"load view failed: $code ${errMsg(body)}")
      JsonMethods.parse(body) \ "metadata"
    }

    def viewExists(ns: String, name: String): Boolean =
      get(s"/v1/namespaces/${nsPath(ns)}/views/$name")._1 == 200

    def createView(ns: String, name: String, doc: JValue): Unit = {
      val (code, body) = post(s"/v1/namespaces/${nsPath(ns)}/views",
        s"""{"name": ${quote(name)}, "metadata": ${JsonMethods.compact(JsonMethods.render(doc))}}""")
      require(code == 200, s"create view failed: $code ${errMsg(body)}")
    }

    def replaceView(ns: String, name: String, doc: JValue): Unit = {
      val (code, body) = post(s"/v1/namespaces/${nsPath(ns)}/views/$name",
        s"""{"metadata": ${JsonMethods.compact(JsonMethods.render(doc))}}""")
      if (code == 404) throw new NoSuchElementException(s"no view $ns.$name")
      require(code == 200, s"replace view failed: $code ${errMsg(body)}")
    }

    def dropView(ns: String, name: String): Boolean = {
      val resp = sendAuth(
        rb(s"/v1/namespaces/${nsPath(ns)}/views/$name").DELETE().build())
      require(resp.statusCode() == 200 || resp.statusCode() == 404,
        s"drop view failed: ${resp.statusCode()} ${resp.body()}")
      resp.statusCode() == 200
    }

    /** follows `next-page-token` like the table listing */
    def listViews(ns: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      var token: Option[String] = Some("")
      while (token.isDefined) {
        val q = token.filter(_.nonEmpty).map(t => s"?pageToken=$t").getOrElse("")
        val (code, body) = get(s"/v1/namespaces/${nsPath(ns)}/views$q")
        if (code != 200) return out.result()
        val j = JsonMethods.parse(body)
        out ++= (j \ "identifiers").children.flatMap(_ \ "name" match {
          case JString(s) => Some(s)
          case _ => None
        })
        token = (j \ "next-page-token") match {
          case JString(t) if t.nonEmpty => Some(t)
          case _ => None
        }
      }
      out.result()
    }

    def renameView(ns: String, name: String, toNs: String, toName: String): Unit = {
      val body =
        s"""{"source": {"namespace": [${quote(ns)}], "name": ${quote(name)}},
           | "destination": {"namespace": [${quote(toNs)}], "name": ${quote(toName)}}}""".stripMargin
      val (code, respBody) = post("/v1/views/rename", body)
      require(code == 200, s"rename view failed: $code ${errMsg(respBody)}")
    }

    // ----- namespace CRUD + rename (the reference's full Catalog trait,
    // icelake/src/catalog/mod.rs:44-138) -----

    def listNamespaces(): Seq[String] = {
      val out = Seq.newBuilder[String]
      var token: Option[String] = Some("")
      while (token.isDefined) {
        val q = token.filter(_.nonEmpty).map(t => s"?pageToken=$t").getOrElse("")
        val (code, body) = get(s"/v1/namespaces$q")
        if (code != 200) return out.result()
        val j = JsonMethods.parse(body)
        out ++= (j \ "namespaces").children.flatMap {
          case JArray(parts) => Some(parts.collect { case JString(s) => s }.mkString("."))
          case JString(s) => Some(s)
          case _ => None
        }
        token = (j \ "next-page-token") match {
          case JString(t) if t.nonEmpty => Some(t)
          case _ => None
        }
      }
      out.result()
    }

    def createNamespace(ns: String, props: Map[String, String] = Map.empty): Unit = {
      val propsJson =
        if (props.isEmpty) ""
        else ", \"properties\": " + JsonMethods.compact(JsonMethods.render(
          JObject(props.toList.map { case (k, v) => k -> (JString(v): JValue) })))
      val parts = ns.split('.').map(quote).mkString(", ")
      val (code, body) =
        post("/v1/namespaces", s"""{"namespace": [$parts]$propsJson}""")
      require(code == 200 || code == 409, s"create namespace failed: $code $body")
    }

    def namespaceExists(ns: String): Boolean = get(s"/v1/namespaces/${nsPath(ns)}")._1 == 200

    /** stored namespace properties (spec: GET /v1/namespaces/{ns}) */
    def namespaceProperties(ns: String): Map[String, String] = {
      val (code, body) = get(s"/v1/namespaces/${nsPath(ns)}")
      require(code == 200, s"load namespace failed: $code ${errMsg(body)}")
      (JsonMethods.parse(body) \ "properties") match {
        case JObject(fields) => fields.collect { case (k, JString(v)) => k -> v }.toMap
        case _ => Map.empty
      }
    }

    /** spec: POST /v1/namespaces/{ns}/properties with removals+updates */
    def updateNamespaceProperties(
        ns: String,
        updates: Map[String, String],
        removals: Seq[String]): Unit = {
      val up = JsonMethods.compact(JsonMethods.render(
        JObject(updates.toList.map { case (k, v) => k -> (JString(v): JValue) })))
      val rm = removals.map(quote).mkString(",")
      val (code, body) = post(s"/v1/namespaces/${nsPath(ns)}/properties",
        s"""{"removals": [$rm], "updates": $up}""")
      require(code == 200, s"update namespace properties failed: $code ${errMsg(body)}")
    }

    /** false when the server refuses (409: namespace not empty) */
    def dropNamespace(ns: String): Boolean = {
      val resp = sendAuth(
        rb(s"/v1/namespaces/${nsPath(ns)}").DELETE().build())
      if (resp.statusCode() == 409) false
      else {
        require(resp.statusCode() == 200 || resp.statusCode() == 404,
          s"drop namespace failed: ${resp.statusCode()} ${resp.body()}")
        resp.statusCode() == 200
      }
    }

    /** rename within the catalog (metadata pointer move; data untouched) */
    def renameTable(ns: String, name: String, toNs: String, toName: String): Unit = {
      val body =
        s"""{"source": {"namespace": [${quote(ns)}], "name": ${quote(name)}},
           | "destination": {"namespace": [${quote(toNs)}], "name": ${quote(toName)}}}""".stripMargin
      val (code, respBody) = post("/v1/tables/rename", body)
      require(code == 200, s"rename failed: $code ${errMsg(respBody)}")
    }

    /** route the table's commits/reloads through this catalog */
    private def wire(ns: String, name: String, t: GraftTable): GraftTable = {
      t.committer = (m, v) => commitTable(ns, name, v, m)
      t.reloader = () => loadTable(ns, name)
      t
    }

    private def quote(s: String): String = JsonMethods.compact(JsonMethods.render(JString(s)))

    /** spec path form for a (possibly multipart) namespace: parts joined
      * by the URL-encoded unit separator %1F — `a.b` → `a%1Fb` — which is
      * how real Iceberg REST services address nested namespaces. Parts
      * themselves are URL-encoded. */
    private def nsPath(ns: String): String =
      ns.split('.').map(p =>
        java.net.URLEncoder.encode(p, "UTF-8").replace("+", "%20"))
        .mkString("%1F")

    /** human-readable message from a spec-shaped error body
      * (`{"error": {"message", "type", "code"}}`), falling back to the
      * raw body for legacy/foreign servers */
    private def errMsg(body: String): String =
      try {
        val e = JsonMethods.parse(body) \ "error"
        (e \ "message", e \ "type") match {
          case (JString(m), JString(t)) => s"$t: $m"
          case (JString(m), _) => m
          case _ => body
        }
      } catch { case _: Exception => body }
  }

  // ---------------- in-process server ----------------

  /** Minimal in-memory catalog server (test/demo; a production deployment
    * would persist). Thread-safe CAS on the per-table version. With a
    * `token`, every request must carry `Authorization: Bearer <token>` or
    * gets a spec-shaped 401. */
  class Server(
      port: Int = 0,
      pageSize: Int = 100,
      token: Option[String] = None,
      credential: Option[String] = None,
      tokenExpiresInSec: Long = 3600L) {
    private case class Entry(version: Int, metadataJson: String)
    private val tables = new ConcurrentHashMap[String, Entry]()
    private val views = new ConcurrentHashMap[String, String]()
    private val namespaces = ConcurrentHashMap.newKeySet[String]()
    private val nsProps = new ConcurrentHashMap[String, Map[String, String]]()
    // bearer tokens minted by the OAuth2 endpoint (credential mode)
    private val issuedTokens = ConcurrentHashMap.newKeySet[String]()
    private val minted = new java.util.concurrent.atomic.AtomicInteger(0)

    /** test hook: server-side revocation — every outstanding bearer
      * starts 401ing, exactly like a catalog restart or a real expiry */
    def revokeTokens(): Unit = issuedTokens.clear()

    /** how many tokens the OAuth endpoint has minted so far */
    def mintedCount: Int = minted.get()
    // multi-table transactions check-then-apply across keys; single-table
    // commits share this lock so no commit interleaves mid-transaction
    private val commitLock = new Object
    private val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", port), 0)

    def start(): String = {
      server.createContext("/v1", handler _)
      server.setExecutor(null)
      server.start()
      s"http://127.0.0.1:${server.getAddress.getPort}"
    }

    def stop(): Unit = server.stop(0)

    /** spec-shaped error body: `{"error": {"message", "type", "code"}}`
      * (the Iceberg REST ErrorResponse model) */
    private def err(ex: HttpExchange, code: Int, typ: String, msg: String): Unit =
      respond(ex, code,
        s"""{"error": {"message": ${JsonMethods.compact(JsonMethods.render(JString(msg)))},
           | "type": "$typ", "code": $code}}""".stripMargin)

    /** stable-cursor paging over a sorted listing: the token is the last
      * name already served (URL-encoded, opaque to clients), so entries
      * created or dropped between pages cannot shift the cursor — an
      * offset-based token skips or duplicates under concurrent mutation.
      * Honors `pageToken`/`pageSize`; emits `next-page-token` while
      * results remain. */
    private def paged(items: Seq[String], query: String): (Seq[String], Option[String]) = {
      val params = Option(query).getOrElse("").split('&').toSeq
        .flatMap(kv => kv.split('=') match {
          case Array(k, v) => Some(k -> v)
          case _ => None
        }).toMap
      val size = math.max(1, params.get("pageSize").flatMap(_.toIntOption).getOrElse(pageSize))
      val sorted = items.sorted
      val remaining = params.get("pageToken")
        .map(t => java.net.URLDecoder.decode(t, "UTF-8"))
        .fold(sorted)(t => sorted.dropWhile(_ <= t))
      val page = remaining.take(size)
      val next =
        if (remaining.length > size)
          Some(java.net.URLEncoder.encode(page.last, "UTF-8"))
        else None
      (page, next)
    }

    private def withNext(next: Option[String]): String =
      next.map(t => s""", "next-page-token": "$t"""").getOrElse("")

    private def quoteJson(s: String): String =
      JsonMethods.compact(JsonMethods.render(JString(s)))

    private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
    }

    private def handler(ex: HttpExchange): Unit = try {
      // the token endpoint itself must be reachable WITHOUT a bearer
      if (ex.getRequestURI.getPath == "/v1/oauth/tokens" &&
        ex.getRequestMethod == "POST") handleOauth(ex)
      else if (!authorized(Option(ex.getRequestHeaders.getFirst("Authorization"))))
        err(ex, 401, "NotAuthorizedException", "missing or invalid credentials")
      else handleAuthorized(ex)
    } catch {
      case e: Throwable =>
        err(ex, 500, "InternalServerError", String.valueOf(e.getMessage))
    }

    private def authorized(auth: Option[String]): Boolean =
      (token, credential) match {
        case (None, None) => true // open server
        case _ => auth.exists(a =>
          token.exists(t => a == s"Bearer $t") ||
            (a.startsWith("Bearer ") &&
              issuedTokens.contains(a.stripPrefix("Bearer "))))
      }

    /** spec: `POST /v1/oauth/tokens`, form-encoded client_credentials
      * grant → a minted bearer accepted by [[authorized]] */
    private def handleOauth(ex: HttpExchange): Unit = {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val params = body.split('&').toSeq
        .map(_.split("=", 2))
        .collect { case Array(k, v) =>
          k -> java.net.URLDecoder.decode(v, "UTF-8") }
        .toMap
      credential match {
        case None =>
          err(ex, 400, "BadRequestException", "oauth is not configured on this server")
        case Some(c) =>
          val Array(id, secret) = c.split(":", 2)
          if (params.get("grant_type").contains("client_credentials") &&
            params.get("client_id").contains(id) &&
            params.get("client_secret").contains(secret)) {
            val tok = java.util.UUID.randomUUID().toString.replace("-", "")
            issuedTokens.add(tok)
            minted.incrementAndGet()
            respond(ex, 200,
              s"""{"access_token": "$tok", "token_type": "bearer", "expires_in": $tokenExpiresInSec}""")
          } else err(ex, 401, "NotAuthorizedException", "invalid client credentials")
      }
    }

    private def handleAuthorized(ex: HttpExchange): Unit = try {
      // multipart namespaces arrive as parts joined by the %1F unit
      // separator (decoded to the raw 0x1f char by URI parsing); internal keys stay
      // dot-joined
      val path = ex.getRequestURI.getPath.replace('\u001f', '.')
      val method = ex.getRequestMethod
      val TablesRe = "/v1/namespaces/([^/]+)/tables".r
      val TableRe = "/v1/namespaces/([^/]+)/tables/([^/]+)".r
      val ViewsRe = "/v1/namespaces/([^/]+)/views".r
      val ViewRe = "/v1/namespaces/([^/]+)/views/([^/]+)".r
      val RegisterRe = "/v1/namespaces/([^/]+)/register".r
      val NamespaceRe = "/v1/namespaces/([^/]+)".r
      val NsPropsRe = "/v1/namespaces/([^/]+)/properties".r
      (method, path) match {
        case ("GET", "/v1/config") =>
          respond(ex, 200, """{"defaults": {}, "overrides": {}}""")
        case ("GET", "/v1/namespaces") =>
          import scala.jdk.CollectionConverters._
          val (page, next) = paged(
            namespaces.asScala.toSeq.sorted, ex.getRequestURI.getQuery)
          val names = page.map(n =>
            n.split('.').map(quoteJson).mkString("[", ",", "]"))
          respond(ex, 200,
            s"""{"namespaces": [${names.mkString(",")}]${withNext(next)}}""")
        case ("POST", "/v1/namespaces") =>
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          val parsed = JsonMethods.parse(body)
          (parsed \ "namespace") match {
            case JArray(parts) =>
              val ns = parts.collect { case JString(s) => s }.mkString(".")
              if (namespaces.add(ns)) {
                (parsed \ "properties") match {
                  case JObject(fields) =>
                    val p = fields.collect { case (k, JString(v)) => k -> v }.toMap
                    if (p.nonEmpty) nsProps.put(ns, p)
                  case _ =>
                }
                respond(ex, 200,
                  s"""{"namespace": ${ns.split('.').map(quoteJson).mkString("[", ",", "]")}}""")
              } else err(ex, 409, "AlreadyExistsException", "namespace exists")
            case _ => err(ex, 400, "BadRequestException", "missing namespace")
          }
        // spec: POST /v1/namespaces/{ns}/properties with
        // {"removals": [...], "updates": {...}} -> updated/removed/missing
        case ("POST", NsPropsRe(ns)) =>
          if (!namespaces.contains(ns))
            err(ex, 404, "NoSuchNamespaceException", "no such namespace")
          else {
            val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
            val j = JsonMethods.parse(body)
            val removals = (j \ "removals") match {
              case JArray(items) => items.collect { case JString(s) => s }
              case _ => Nil
            }
            val updates = (j \ "updates") match {
              case JObject(fields) => fields.collect { case (k, JString(v)) => k -> v }.toMap
              case _ => Map.empty[String, String]
            }
            if (removals.exists(updates.contains))
              err(ex, 422, "UnprocessableEntityException",
                "a key appears in both removals and updates")
            else {
              val before = Option(nsProps.get(ns)).getOrElse(Map.empty)
              val (present, missing) = removals.partition(before.contains)
              nsProps.put(ns, before -- removals ++ updates)
              def arr(xs: Seq[String]) = xs.map(quoteJson).mkString(",")
              respond(ex, 200,
                s"""{"updated": [${arr(updates.keys.toSeq.sorted)}],
                   | "removed": [${arr(present)}],
                   | "missing": [${arr(missing)}]}""".stripMargin)
            }
          }
        case ("GET", NamespaceRe(ns)) =>
          if (namespaces.contains(ns)) {
            val props = Option(nsProps.get(ns)).getOrElse(Map.empty)
            val propsJson = JsonMethods.compact(JsonMethods.render(
              JObject(props.toList.sortBy(_._1).map { case (k, v) => k -> (JString(v): JValue) })))
            respond(ex, 200,
              s"""{"namespace": ${ns.split('.').map(quoteJson).mkString("[", ",", "]")}, "properties": $propsJson}""")
          } else err(ex, 404, "NoSuchNamespaceException", "no such namespace")
        case ("DELETE", NamespaceRe(ns)) =>
          import scala.jdk.CollectionConverters._
          if (tables.keys.asScala.exists(_.startsWith(s"$ns.")))
            err(ex, 409, "NamespaceNotEmptyException", "namespace not empty")
          else { namespaces.remove(ns); nsProps.remove(ns); respond(ex, 200, "{}") }
        case ("POST", "/v1/tables/rename") =>
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          val j = JsonMethods.parse(body)
          def ident(sel: JValue): Option[String] = for {
            ns <- (sel \ "namespace") match {
              case JArray(parts) => Some(parts.collect { case JString(s) => s }.mkString("."))
              case _ => None
            }
            n <- (sel \ "name") match { case JString(s) => Some(s); case _ => None }
          } yield s"$ns.$n"
          (ident(j \ "source"), ident(j \ "destination")) match {
            case (Some(src), Some(dst)) =>
              Option(tables.get(src)) match {
                case None => err(ex, 404, "NoSuchTableException", "no such table")
                case Some(e) =>
                  if (tables.putIfAbsent(dst, e) != null)
                    err(ex, 409, "AlreadyExistsException", "rename destination exists")
                  else { tables.remove(src); respond(ex, 200, "{}") }
              }
            case _ => err(ex, 400, "BadRequestException", "bad rename request")
          }
        case ("GET", TableRe(ns, name)) =>
          Option(tables.get(s"$ns.$name")) match {
            case None => err(ex, 404, "NoSuchTableException", "no such table")
            case Some(e) => respond(ex, 200,
              s"""{"metadata-location": "rest://$ns/$name/v${e.version}",
                 | "version": ${e.version}, "metadata": ${e.metadataJson}}""".stripMargin)
          }
        case ("GET", TablesRe(ns)) =>
          import scala.jdk.CollectionConverters._
          val (page, next) = paged(
            tables.keys.asScala.filter(_.startsWith(s"$ns.")).toSeq.sorted,
            ex.getRequestURI.getQuery)
          val names = page
            .map(k => s"""{"namespace": ["$ns"], "name": "${k.stripPrefix(s"$ns.")}"}""")
          respond(ex, 200,
            s"""{"identifiers": [${names.mkString(",")}]${withNext(next)}}""")
        case ("GET", ViewRe(ns, name)) =>
          Option(views.get(s"$ns.$name")) match {
            case None => err(ex, 404, "NoSuchViewException", "no such view")
            case Some(doc) => respond(ex, 200, s"""{"metadata": $doc}""")
          }
        case ("POST", ViewsRe(ns)) =>
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          val j = JsonMethods.parse(body)
          (j \ "name") match {
            case JString(name) =>
              val doc = JsonMethods.compact(JsonMethods.render(j \ "metadata"))
              if (views.putIfAbsent(s"$ns.$name", doc) != null)
                err(ex, 409, "AlreadyExistsException", "view exists")
              else respond(ex, 200, s"""{"metadata": $doc}""")
            case _ => err(ex, 400, "BadRequestException", "missing name")
          }
        case ("POST", ViewRe(ns, name)) =>
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          val doc = JsonMethods.compact(
            JsonMethods.render(JsonMethods.parse(body) \ "metadata"))
          if (views.replace(s"$ns.$name", doc) == null)
            err(ex, 404, "NoSuchViewException", "no such view")
          else respond(ex, 200, s"""{"metadata": $doc}""")
        case ("DELETE", ViewRe(ns, name)) =>
          if (views.remove(s"$ns.$name") != null) respond(ex, 200, "{}")
          else err(ex, 404, "NoSuchViewException", "no such view")
        case ("GET", ViewsRe(ns)) =>
          import scala.jdk.CollectionConverters._
          val names = views.keys.asScala.toSeq
            .filter(_.startsWith(s"$ns.")).map(_.stripPrefix(s"$ns.")).sorted
          val (page, next) = paged(names, ex.getRequestURI.getQuery)
          val ids = page.map(n =>
            s"""{"namespace": ["$ns"], "name": "$n"}""")
          respond(ex, 200,
            s"""{"identifiers": [${ids.mkString(",")}]${withNext(next)}}""")
        case ("POST", "/v1/views/rename") =>
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          val j = JsonMethods.parse(body)
          def ident(sel: JValue): Option[String] = for {
            ns <- (sel \ "namespace") match {
              case JArray(parts) => Some(parts.collect { case JString(x) => x }.mkString("."))
              case _ => None
            }
            n <- (sel \ "name") match { case JString(x) => Some(x); case _ => None }
          } yield s"$ns.$n"
          (ident(j \ "source"), ident(j \ "destination")) match {
            case (Some(src), Some(dst)) =>
              Option(views.get(src)) match {
                case None => err(ex, 404, "NoSuchViewException", "no such view")
                case Some(doc) =>
                  if (views.putIfAbsent(dst, doc) != null)
                    err(ex, 409, "AlreadyExistsException", "rename destination exists")
                  else { views.remove(src); respond(ex, 200, "{}") }
              }
            case _ => err(ex, 400, "BadRequestException", "bad rename request")
          }
        case ("POST", TablesRe(ns)) =>
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          val j = JsonMethods.parse(body)
          val name = (j \ "name") match {
            case JString(s) => s
            case _ => return err(ex, 400, "BadRequestException", "missing name")
          }
          val meta = JsonMethods.compact(JsonMethods.render(j \ "metadata"))
          if (tables.putIfAbsent(s"$ns.$name", Entry(1, meta)) != null)
            err(ex, 409, "AlreadyExistsException", "table exists")
          else respond(ex, 200, s"""{"version": 1, "metadata": $meta}""")
        case ("POST", RegisterRe(ns)) =>
          // register: the table's CURRENT metadata file, read server-side
          // from shared storage and served as version 1 — no copy, no
          // rewrite; data/manifest paths keep pointing where they are
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          val j = JsonMethods.parse(body)
          ((j \ "name"), (j \ "metadata-location")) match {
            case (JString(name), JString(metaLoc)) =>
              val p = new org.apache.hadoop.fs.Path(metaLoc)
              val fs = p.getFileSystem(new Configuration())
              if (!fs.exists(p))
                err(ex, 404, "NoSuchTableException", s"no metadata file at $metaLoc")
              else {
                val metaJson = {
                  val in = fs.open(p)
                  try new String(in.readAllBytes(), StandardCharsets.UTF_8)
                  finally in.close()
                }
                if (tables.putIfAbsent(s"$ns.$name", Entry(1, metaJson)) != null)
                  err(ex, 409, "AlreadyExistsException", "table exists")
                else respond(ex, 200, s"""{"version": 1, "metadata": $metaJson}""")
              }
            case _ =>
              err(ex, 400, "BadRequestException", "register needs name and metadata-location")
          }
        case ("POST", TableRe(ns, name)) =>
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          val j = JsonMethods.parse(body)
          val expected = (j \ "requirements").children.collectFirst {
            case req if (req \ "type") == JString("assert-version") =>
              (req \ "version") match {
                case JInt(v) => v.toInt
                case JLong(v) => v.toInt
                case _ => -1
              }
          }.getOrElse(-1)
          val expectedUuid = (j \ "requirements").children.collectFirst {
            case req if (req \ "type") == JString("assert-table-uuid") =>
              (req \ "uuid") match {
                case JString(u) => u
                case _ => ""
              }
          }
          val meta = JsonMethods.compact(JsonMethods.render(j \ "metadata"))
          val key = s"$ns.$name"
          val cur = Option(tables.get(key))
          cur match {
            case None => err(ex, 404, "NoSuchTableException", "no such table")
            case Some(e) if e.version != expected =>
              err(ex, 409, "CommitFailedException", s"version conflict: current is ${e.version}")
            case Some(e) if expectedUuid.exists(u =>
                (JsonMethods.parse(e.metadataJson) \ "table-uuid") != JString(u)) =>
              // requirement-failed per the REST spec: the table at this
              // identifier is not the one the writer thinks it is (e.g.
              // dropped and recreated underneath)
              err(ex, 409, "CommitFailedException", "requirement failed: uuid")
            case Some(e) =>
              // CAS: replace only if unchanged since we read it (under
              // the shared lock so transactions stay atomic against it)
              val ok = commitLock.synchronized {
                tables.replace(key, e, Entry(e.version + 1, meta))
              }
              if (ok) respond(ex, 200, s"""{"version": ${e.version + 1}}""")
              else err(ex, 409, "CommitFailedException", "concurrent update")
          }
        case ("POST", "/v1/transactions/commit") =>
          // multi-table transaction (Iceberg REST CommitTransaction
          // shape): every change's requirements validate against the
          // CURRENT state and either ALL tables commit or none do
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          val j = JsonMethods.parse(body)
          case class Change(key: String, expected: Int, uuid: Option[String], meta: String)
          val changes = (j \ "table-changes").children.map { ch =>
            val ns = (ch \ "identifier" \ "namespace").children
              .collect { case JString(s) => s }.mkString(".")
            val name = (ch \ "identifier" \ "name") match {
              case JString(s) => s
              case _ => ""
            }
            val expected = (ch \ "requirements").children.collectFirst {
              case req if (req \ "type") == JString("assert-version") =>
                (req \ "version") match {
                  case JInt(v) => v.toInt
                  case JLong(v) => v.toInt
                  case _ => -1
                }
            }.getOrElse(-1)
            val uuid = (ch \ "requirements").children.collectFirst {
              case req if (req \ "type") == JString("assert-table-uuid") =>
                (req \ "uuid") match { case JString(u) => u; case _ => "" }
            }
            Change(s"$ns.$name",
              expected, uuid, JsonMethods.compact(JsonMethods.render(ch \ "metadata")))
          }
          if (changes.isEmpty)
            err(ex, 400, "BadRequestException", "empty transaction")
          else {
            val result: Either[String, Seq[(String, Int)]] = commitLock.synchronized {
              val checked = changes.map { c =>
                Option(tables.get(c.key)) match {
                  case None => Left(s"no such table ${c.key}")
                  case Some(e) if e.version != c.expected =>
                    Left(s"version conflict on ${c.key}: current is ${e.version}")
                  case Some(e) if c.uuid.exists(u =>
                      (JsonMethods.parse(e.metadataJson) \ "table-uuid") != JString(u)) =>
                    Left(s"requirement failed on ${c.key}: uuid")
                  case Some(e) => Right(c -> e)
                }
              }
              checked.collectFirst { case Left(m) => m } match {
                case Some(m) => Left(m)
                case None => Right(checked.collect { case Right((c, e)) =>
                  tables.put(c.key, Entry(e.version + 1, c.meta))
                  c.key -> (e.version + 1)
                })
              }
            }
            result match {
              case Left(msg) => err(ex, 409, "CommitFailedException", msg)
              case Right(versions) =>
                respond(ex, 200,
                  versions.map { case (k, v) =>
                    s"${JsonMethods.compact(JsonMethods.render(JString(k)))}: $v"
                  }.mkString("""{"versions": {""", ", ", "}}"))
            }
          }
        case ("DELETE", TableRe(ns, name)) =>
          tables.remove(s"$ns.$name")
          respond(ex, 200, "{}")
        case _ => err(ex, 404, "NotFoundException", "not found")
      }
    } catch {
      case e: Throwable =>
        err(ex, 500, "InternalServerError", String.valueOf(e.getMessage))
    }
  }
}

/** Standalone entry point so conformance tests can exercise the catalog
  * protocol against a genuinely out-of-process server (real socket, real
  * auth headers): `runMain graft.tables.RestServerMain [pageSize] [token]`
  * prints `REST_URI=<uri>` on stdout and serves until killed. */
object RestServerMain {
  def main(args: Array[String]): Unit = {
    val pageSize = args.headOption.flatMap(_.toIntOption).getOrElse(100)
    val token = args.drop(1).headOption.filter(_.nonEmpty)
    val server = new RestCatalog.Server(pageSize = pageSize, token = token)
    println(s"REST_URI=${server.start()}")
    Thread.currentThread().join()
  }
}

package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.engine.{Analytics, AnalyticsServer, Bookmarks, NycFixtures}

/** Drives every reference route (webserver/server.py:345-588) over HTTP
  * against the NYC micro-fixtures and asserts the JSON/CSV bodies carry
  * exactly the [[Analytics]] frames — the serving tier is a shell, not a
  * second computation.
  */
class ServerSpec extends SparkSpec {

  private lazy val geo = NycFixtures.geo(spark)
  private lazy val sr = NycFixtures.serviceRequests(spark)
  private lazy val ct = NycFixtures.complaintTypes(spark)
  private lazy val prop = NycFixtures.properties(spark)
  private lazy val sale = NycFixtures.sales(spark)

  private val client = HttpClient.newHttpClient()

  private def get(port: Int, path: String,
                  cookie: Option[String] = None): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path"))
    cookie.foreach(c => b.header("Cookie", c))
    client.send(b.GET().build(), HttpResponse.BodyHandlers.ofString())
  }

  private def post(port: Int, path: String,
                   cookie: Option[String] = None): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path"))
      .POST(HttpRequest.BodyPublishers.noBody())
    cookie.foreach(c => b.header("Cookie", c))
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  private def withServer[A](store: Option[String] = None,
                            geocoder: Option[String => Option[String]] = None)
                           (f: (Int, AnalyticsServer) => A): A = {
    val srv = new AnalyticsServer(spark, geo, sr, ct, sale, prop, store,
      geocoder)
    val port = srv.start()
    try f(port, srv) finally srv.stop()
  }

  test("GET /analytics/<bbl> serves the dashboard frames as JSON; " +
      "unknown is 404, malformed is 400") {
    withServer() { (port, _) =>
      val r = get(port, "/analytics/1-42-7")
      assert(r.statusCode() == 200)
      val body = r.body()
      assert(body.contains("\"geographic_id\":101"))
      // totals frame: 13 in-window, 7 active (AnalyticsSpec's numbers)
      assert(body.contains("\"total_count\":13") &&
        body.contains("\"active_count\":7"))
      // chart: 6 buckets ending in Other (top-5 + residual)
      assert(body.contains("\"bucket\":\"Other\""))
      // sales stats: the interpolated median
      assert(body.contains("\"median_price\":212500.375"))
      assert(body.contains("\"is_bookmarked\":false"))
      assert(get(port, "/analytics/9-9-9").statusCode() == 404)
      assert(get(port, "/analytics/not-a-bbl").statusCode() == 400)
      assert(get(port, "/analytics/xyz").statusCode() == 400)
    }
  }

  test("GET /analytics honors the window params (2023 row appears only " +
      "when the window opens)") {
    withServer() { (port, _) =>
      val all = get(port,
        "/analytics/1-42-7?start_date=2023-01-01&end_date=2025-12-31")
      assert(all.body().contains("\"total_count\":15"))
    }
  }

  test("GET /trends/<bbl> serves both series with gap-filled months") {
    withServer() { (port, _) =>
      val r = get(port, "/trends/1-42-7?type=service_requests")
      assert(r.statusCode() == 200)
      // 12 month objects; March 2024 gap-filled to zero
      assert(r.body().split("\\{").length - 1 == 12)
      assert(r.body().contains("\"count\":0"))
      val s = get(port, "/trends/1-42-7?type=sales")
      assert(s.statusCode() == 200)
      // Feb has no sales → null median under the gap-fill contract
      assert(s.body().contains("\"median_price\":null"))
      assert(get(port, "/trends/9-9-9").statusCode() == 404)
    }
  }

  test("GET /compare answers both keys in one frame; unknowns are absent") {
    withServer() { (port, _) =>
      val r = get(port, "/compare?bbl1=1-42-7&bbl2=3-100-55")
      assert(r.statusCode() == 200)
      assert(r.body().contains("\"geographic_id\":101") &&
        r.body().contains("\"geographic_id\":102"))
      val one = get(port, "/compare?bbl1=1-42-7&bbl2=9-9-9")
      assert(one.body().contains("101") && !one.body().contains("\"geographic_id\":102"))
    }
  }

  test("GET /export/<bbl> emits the reference's exact CSV headers") {
    withServer() { (port, _) =>
      val c = get(port, "/export/1-42-7?type=complaints")
      assert(c.statusCode() == 200)
      assert(c.headers().firstValue("Content-Type").get.startsWith("text/csv"))
      val lines = c.body().split("\r\n").toSeq
      assert(lines.head == "Complaint Type,Total Count,Active Count")
      assert(lines.tail.head.startsWith("Type_1,3,"))
      val s = get(port, "/export/1-42-7?type=sales")
      assert(s.body().split("\r\n").head == "Address,Sale Price,Sale Date")
      assert(s.body().contains("1 Main St"))
    }
  }

  test("POST /bookmark toggles per session; /bookmarks serves all-time " +
      "summaries; /login is the reference's dead 401 stub") {
    withServer() { (port, _) =>
      val first = post(port, "/bookmark/1-42-7")
      assert(first.body().contains("\"action\":\"added\""))
      val cookie = first.headers().firstValue("Set-Cookie").get
      assert(cookie.startsWith("graft_session="))
      // same session: dashboard shows bookmarked, summaries appear
      assert(get(port, "/analytics/1-42-7", Some(cookie)).body()
        .contains("\"is_bookmarked\":true"))
      val bms = get(port, "/bookmarks", Some(cookie))
      assert(bms.body().contains("\"bookmarks\":[\"1-42-7\"]"))
      // all-time totals: 15 rows on geo 101
      assert(bms.body().contains("\"total_count\":15"))
      // a DIFFERENT session sees nothing (per-session state)
      assert(get(port, "/bookmarks").body().contains("\"bookmarks\":[]"))
      // toggle off
      assert(post(port, "/bookmark/1-42-7", Some(cookie)).body()
        .contains("\"action\":\"removed\""))
      assert(get(port, "/login").statusCode() == 401)
    }
  }

  test("POST /search geocodes, redirects into the dashboard, and keeps " +
      "the reference's 400/404 contracts") {
    // injected geocoder, the Geocode.resolveWithCache seam: one known
    // normalized address → the 10-digit wire BBL of geo 101
    val gc: String => Option[String] =
      k => if (k == "123 MAIN ST MANHATTAN") Some("1000420007") else None
    withServer(geocoder = Some(gc)) { (port, _) =>
      val hit = post(port,
        "/search?house_number=123&street=Main%20St&borough=Manhattan" +
          "&start_date=2024-01-01&end_date=2024-06-30")
      assert(hit.statusCode() == 302)
      val loc = hit.headers().firstValue("Location").get
      assert(loc == "/analytics/1-00042-0007?start_date=2024-01-01" +
        "&end_date=2024-06-30")
      // the redirect target resolves (padded dashed form parses)
      assert(get(port, loc).body().contains("\"geographic_id\":101"))
      // geocode miss → the reference's 404 message shape
      assert(post(port,
        "/search?house_number=9&street=Nowhere&borough=Queens")
        .statusCode() == 404)
      // missing fields → the reference's 400
      assert(post(port, "/search?house_number=123&street=Main%20St")
        .statusCode() == 400)
      // form-body fields work like query params (request.form)
      val b = HttpRequest.newBuilder(
          URI.create(s"http://localhost:$port/search"))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString(
          "house_number=123&street=Main+St&borough=Manhattan"))
        .build()
      assert(client.send(b,
        HttpResponse.BodyHandlers.ofString()).statusCode() == 302)
    }
    // no geocoder configured → explicit 503, not a crash
    withServer() { (port, _) =>
      assert(post(port,
        "/search?house_number=1&street=A&borough=B").statusCode() == 503)
    }
  }

  test("GET / lists the routes") {
    withServer() { (port, _) =>
      val r = get(port, "/")
      assert(r.statusCode() == 200 && r.body().contains("/analytics/<bbl>"))
    }
  }

  test("a persisted store carries bookmark state across a server restart " +
      "and equals the in-memory fold") {
    val store = java.nio.file.Files
      .createTempDirectory("graft_bm").toString + "/toggles"
    val cookie = withServer(Some(store)) { (port, _) =>
      val first = post(port, "/bookmark/1-42-7")
      val cookie = first.headers().firstValue("Set-Cookie").get
      post(port, "/bookmark/3-100-55", Some(cookie))
      post(port, "/bookmark/1-42-7", Some(cookie)) // toggle 1-42-7 OFF
      cookie
    }
    // restart: a NEW server over the same store resumes the session
    withServer(Some(store)) { (port, _) =>
      val bms = get(port, "/bookmarks", Some(cookie))
      assert(bms.body().contains("\"bookmarks\":[\"3-100-55\"]"))
    }
    // the replay face equals the in-memory fold of the same events
    val folded = Seq("1-42-7", "3-100-55", "1-42-7")
      .foldLeft(Seq.empty[String])(Bookmarks.toggle)
    val sid = cookie.stripPrefix("graft_session=").toLong
    assert(Bookmarks.saved(spark, store, sid) == folded)
    import spark.implicits._
    val replayed = Bookmarks.replay(spark, store)
      .filter(_.userId == sid).collect()
    assert(replayed.length == 1 && replayed.head.bbls == folded)
  }

  test("GET /vdash serves the dashboard AS OF a snapshot-group cut: " +
      "cut 1 replays the pre-mutation state after both members " +
      "advanced, the default is the latest cut, and bad cuts are 400") {
    import graft.sources.{Scd, SnapshotGroup, TimeTravel}
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_vdash_srv").toString
    val (factsDir, dimDir, gDir) =
      (base + "/facts", base + "/dim", base + "/cut")
    // facts v1: 6 rows over two types; dim v1: type -> label
    TimeTravel.commitAppend(
      Seq((1L, "noise", 10L), (2L, "noise", 20L), (3L, "heat", 30L),
        (4L, "heat", 40L), (5L, "heat", 50L), (6L, "noise", 60L))
        .toDF("id", "ctype", "amount"),
      factsDir, Seq("id"), files = 1)
    Scd.merge(spark, dimDir, "ctype",
      Seq(("noise", "Noise"), ("heat", "Heating")).toDF("ctype", "label"),
      files = 1)
    SnapshotGroup.publish(spark, gDir,
      Map("facts" -> factsDir, "dim" -> dimDir)) // cut 1
    // mutate BOTH members, then publish cut 2
    TimeTravel.commitDelete(spark, factsDir, "id", Seq(1L, 3L).toDF("id"))
    Scd.merge(spark, dimDir, "ctype",
      Seq(("heat", "Heat/Hot Water")).toDF("ctype", "label"), files = 1)
    SnapshotGroup.publish(spark, gDir,
      Map("facts" -> factsDir, "dim" -> dimDir)) // cut 2
    val srv = new AnalyticsServer(spark, geo, sr, ct, sale, prop,
      versionedGroup = Some(AnalyticsServer.VersionedGroup(
        gDir, "facts", "dim", "ctype")))
    val port = srv.start()
    try {
      // cut 1, requested AFTER both members advanced: the original
      // labels and the full fact set
      val c1 = get(port, "/vdash?by=label&sum=amount&cut=1")
      assert(c1.statusCode() == 200, c1.body())
      assert(c1.body().contains("\"cut\":1"))
      assert(c1.body().contains(
        "{\"label\":\"Heating\",\"n\":3,\"sum_amount\":120}"), c1.body())
      assert(c1.body().contains(
        "{\"label\":\"Noise\",\"n\":3,\"sum_amount\":90}"))
      // default = the latest cut: post-delete facts, re-labeled dim
      val c2 = get(port, "/vdash?by=label&sum=amount")
      assert(c2.statusCode() == 200)
      assert(c2.body().contains("\"cut\":2"))
      assert(c2.body().contains(
        "{\"label\":\"Heat/Hot Water\",\"n\":2,\"sum_amount\":90}"),
        c2.body())
      assert(c2.body().contains(
        "{\"label\":\"Noise\",\"n\":2,\"sum_amount\":80}"))
      // guards: malformed/out-of-range cut and missing by are 400
      assert(get(port, "/vdash?by=label&cut=nope").statusCode() == 400)
      assert(get(port, "/vdash?by=label&cut=9").statusCode() == 400)
      assert(get(port, "/vdash").statusCode() == 400)
      assert(get(port, "/vdash?by=no_such_col").statusCode() == 400)
    } finally srv.stop()
    // a server WITHOUT a configured group 404s the route
    withServer() { (port2, _) =>
      assert(get(port2, "/vdash?by=label").statusCode() == 404)
    }
    // the SQL face drives the same cut-pinned rollup from text alone
    GraftExtensions.register(spark)
    val sqlRows = spark.sql(
      s"SELECT * FROM graft_vdash('$gDir', 'facts', 'dim', 'ctype', " +
        "'label', 'amount', 1)").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(sqlRows == Set(("Heating", 3L, 120L), ("Noise", 3L, 90L)))
    // no sum, latest cut
    val latest = spark.sql(
      s"SELECT * FROM graft_vdash('$gDir', 'facts', 'dim', 'ctype', " +
        "'label')").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(latest == Set(("Heat/Hot Water", 2L), ("Noise", 2L)))
  }
}

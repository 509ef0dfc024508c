package graft

import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.file.Files

/** Serve mode: the Spark Connect gRPC endpoint boots over a topic
  * catalog, listens, publishes topics as global temp views, and
  * stops cleanly. (Full remote-client round-trips need the separate
  * connect-client jar, which conflicts with the server classpath in
  * one JVM — transport liveness + publication surface are asserted
  * here.) */
class ServeSpec extends SparkSpec {

  private def freePort(): Int = {
    val s = new ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  test("serve boots a gRPC endpoint over the catalog and stops cleanly") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_serve").toString
    val seed = new GraftSession(spark, root)
    val t0 = new java.sql.Timestamp(1700000000L * 1000)
    seed.publish("served_topic", Seq((1L, t0, 1.0), (2L, t0, 2.0)).toDF("key", "time", "v"))

    val port = freePort()
    val gs = Serve.start(spark, root, port)
    try {
      // the gRPC server is really listening on the configured port
      val sock = new Socket()
      try {
        sock.connect(new InetSocketAddress("127.0.0.1", port), 5000)
        assert(sock.isConnected)
      } finally sock.close()
      // topics are published where isolated Connect sessions can see
      // them: the global temp view database
      val published = spark.sql(
        "SHOW TABLES IN global_temp").collect().map(_.getString(1))
      assert(published.contains("served_topic"),
        s"topic must be a global temp view, saw: ${published.mkString(",")}")
      assert(spark.sql("SELECT count(*) AS n FROM global_temp.served_topic")
        .collect().head.getLong(0) == 2L)
    } finally {
      Serve.shutdown(gs)
      spark.catalog.dropGlobalTempView("served_topic")
    }
    // after shutdown the port is released (gRPC stop is async-ish:
    // poll up to 10 s rather than flake on a slow teardown)
    def portClosed(): Boolean = {
      val s = new Socket()
      try { s.connect(new InetSocketAddress("127.0.0.1", port), 1000); false }
      catch { case _: java.io.IOException => true }
      finally s.close()
    }
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (!portClosed() && System.nanoTime() < deadline) Thread.sleep(200)
    assert(portClosed(), "port must be released after shutdown")
  }

  test("a token-gated server rejects unauthenticated requests and serves bearer-authenticated ones") {
    // the reference gates its Flight endpoint with bearer-token auth
    // (ella-server/src/server/auth.rs:52-63: Authorization: Bearer
    // <token> or UNAUTHENTICATED); Spark Connect's pre-shared-key
    // interceptor is the native counterpart. Drive the gRPC surface
    // directly (the server classpath ships the shaded grpc + proto
    // stubs) so the reject/accept pair is asserted at the transport.
    import org.sparkproject.connect.grpc.{ManagedChannelBuilder, Metadata, Status, StatusRuntimeException}
    import org.sparkproject.connect.grpc.stub.MetadataUtils
    import org.apache.spark.connect.proto
    val root = Files.createTempDirectory("graft_serve_auth").toString
    val port = freePort()
    val gs = Serve.start(spark, root, port, token = Some("graft-test-secret"))
    try {
      val channel = ManagedChannelBuilder.forAddress("localhost", port)
        .usePlaintext().build()
      try {
        val stub = proto.SparkConnectServiceGrpc.newBlockingStub(channel)
        val req = proto.ConfigRequest.newBuilder()
          .setSessionId(java.util.UUID.randomUUID().toString)
          .setUserContext(proto.UserContext.newBuilder().setUserId("probe"))
          .setOperation(proto.ConfigRequest.Operation.newBuilder()
            .setGet(proto.ConfigRequest.Get.newBuilder()
              .addKeys("spark.sql.session.timeZone")))
          .build()
        def bearer(t: String) = {
          val md = new Metadata()
          md.put(Metadata.Key.of("Authorization", Metadata.ASCII_STRING_MARSHALLER),
            s"Bearer $t")
          stub.withInterceptors(MetadataUtils.newAttachHeadersInterceptor(md))
        }
        val denied = intercept[StatusRuntimeException] { stub.config(req) }
        assert(denied.getStatus.getCode == Status.Code.UNAUTHENTICATED,
          s"no token must be UNAUTHENTICATED, got ${denied.getStatus}")
        val wrong = intercept[StatusRuntimeException] { bearer("not-the-secret").config(req) }
        assert(wrong.getStatus.getCode == Status.Code.UNAUTHENTICATED,
          s"a wrong token must be UNAUTHENTICATED, got ${wrong.getStatus}")
        val resp = bearer("graft-test-secret").config(req)
        assert(resp.getPairsCount == 1 && resp.getPairs(0).getValue == "UTC",
          "an authenticated request completes the round-trip")
      } finally channel.shutdownNow()
    } finally Serve.shutdown(gs)
  }

  test("minted-connection auth: handshake issues a token, revocation kills it") {
    // the ISSUANCE half of the reference's auth stack (auth.rs
    // ConnectionManager.handshake + Interceptor::call + flight.rs
    // do_handshake): the server mints HMAC-signed connection tokens
    // and admits a request only while the token's connection id stays
    // registered — revocation is dropping the registration.
    import org.sparkproject.connect.grpc.{ManagedChannelBuilder, Metadata, Status, StatusRuntimeException}
    import org.sparkproject.connect.grpc.stub.MetadataUtils
    import org.apache.spark.connect.proto
    val root = Files.createTempDirectory("graft_serve_mint").toString
    val port = freePort()
    val mport = freePort()
    val gs = Serve.start(spark, root, port, metricsPort = Some(mport),
      mintSecret = Some("graft-admin-secret"))
    def http(method: String, path: String, admin: Option[String]): (Int, String, Option[String]) = {
      val c = new java.net.URL(s"http://localhost:$mport$path")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      c.setRequestMethod(method)
      admin.foreach(a => c.setRequestProperty("Authorization", s"Bearer $a"))
      val code = c.getResponseCode
      val is = if (code >= 400) c.getErrorStream else c.getInputStream
      val body = if (is == null) "" else {
        val b = scala.io.Source.fromInputStream(is).mkString; is.close(); b
      }
      (code, body, Option(c.getHeaderField("X-Graft-Jti")))
    }
    try {
      val channel = ManagedChannelBuilder.forAddress("localhost", port)
        .usePlaintext().build()
      try {
        val stub = proto.SparkConnectServiceGrpc.newBlockingStub(channel)
        val req = proto.ConfigRequest.newBuilder()
          .setSessionId(java.util.UUID.randomUUID().toString)
          .setUserContext(proto.UserContext.newBuilder().setUserId("probe"))
          .setOperation(proto.ConfigRequest.Operation.newBuilder()
            .setGet(proto.ConfigRequest.Get.newBuilder()
              .addKeys("spark.sql.session.timeZone")))
          .build()
        def bearer(t: String) = {
          val md = new Metadata()
          md.put(Metadata.Key.of("Authorization", Metadata.ASCII_STRING_MARSHALLER),
            s"Bearer $t")
          stub.withInterceptors(MetadataUtils.newAttachHeadersInterceptor(md))
        }
        // handshake requires the admin gate
        assert(http("POST", "/token", None)._1 == 401)
        assert(http("POST", "/token", Some("wrong"))._1 == 401)
        val (code, token, jti) = http("POST", "/token", Some("graft-admin-secret"))
        assert(code == 200 && token.count(_ == '.') == 2 && jti.nonEmpty,
          s"handshake must mint a signed token, got $code/$token")
        // gRPC: no token / garbage / the ADMIN secret itself all fail —
        // only a minted connection token is admitted
        val denied = intercept[StatusRuntimeException] { stub.config(req) }
        assert(denied.getStatus.getCode == Status.Code.UNAUTHENTICATED)
        val garbage = intercept[StatusRuntimeException] { bearer("a.b.c").config(req) }
        assert(garbage.getStatus.getCode == Status.Code.UNAUTHENTICATED)
        val adminAsToken = intercept[StatusRuntimeException] {
          bearer("graft-admin-secret").config(req) }
        assert(adminAsToken.getStatus.getCode == Status.Code.UNAUTHENTICATED)
        val resp = bearer(token).config(req)
        assert(resp.getPairsCount == 1 && resp.getPairs(0).getValue == "UTC",
          "a minted token completes the round-trip")
        // a tampered payload with the real structure fails the HMAC
        val Array(h, p, s) = token.split('.')
        val tampered = intercept[StatusRuntimeException] {
          bearer(s"$h.${p.reverse}.$s").config(req) }
        assert(tampered.getStatus.getCode == Status.Code.UNAUTHENTICATED)
        // revocation: the SAME token stops verifying immediately
        assert(http("DELETE", s"/token/${jti.get}", Some("graft-admin-secret"))._1 == 200)
        val revoked = intercept[StatusRuntimeException] { bearer(token).config(req) }
        assert(revoked.getStatus.getCode == Status.Code.UNAUTHENTICATED,
          "a revoked connection id must stop authenticating")
        assert(http("DELETE", s"/token/${jti.get}", Some("graft-admin-secret"))._1 == 404,
          "double-revoke reports no such connection")
      } finally channel.shutdownNow()
    } finally Serve.shutdown(gs)
  }

  test("a remote Connect session publishes into a topic (INSERT over the wire)") {
    // the reference's remote write path (flight.rs:492
    // do_put_statement_update; pyella/examples/publisher.py): a
    // client sends INSERT INTO <topic> and the server lands it in the
    // topic's bucketed layout. Here the V2 catalog surface carries
    // it: one remote session inserts, a second reads the rows back,
    // and the server-side session sees them in the topic itself.
    import spark.implicits._
    val root = Files.createTempDirectory("graft_serve3").toString
    val seed = new GraftSession(spark, root)
    val t0 = new java.sql.Timestamp(1700000000L * 1000)
    seed.publish("pub_remote", Seq((1L, t0, 1.0)).toDF("key", "time", "v"))

    val port = freePort()
    val gs = Serve.start(spark, root, port)
    try {
      val conn = Connect.jdbc(s"sc://localhost:$port")
      try {
        val st = conn.createStatement()
        try st.execute(
          "INSERT INTO graft.pub_remote VALUES (2, TIMESTAMP '2023-11-14 22:13:20', 41.0)")
        finally st.close()
      } finally conn.close()
      val conn2 = Connect.jdbc(s"sc://localhost:$port")
      try {
        val st2 = conn2.createStatement()
        val rs = st2.executeQuery(
          "SELECT count(*) AS n, sum(v) AS s FROM graft.pub_remote")
        try {
          assert(rs.next())
          assert(rs.getLong("n") == 2L, "second remote session must see the insert")
          assert(rs.getDouble("s") == 42.0)
        } finally { rs.close(); st2.close() }
      } finally conn2.close()
      assert(gs.table("pub_remote").count() == 2,
        "server-side session must see remotely published rows in the topic")
      val buckets = new java.io.File(s"$root/topics/ella.public.pub_remote")
        .listFiles().filter(_.getName.startsWith("bucket="))
      assert(buckets.nonEmpty, "remote insert must land in the bucketed layout")
    } finally {
      Serve.shutdown(gs)
      spark.catalog.dropGlobalTempView("pub_remote")
    }
  }

  test("remote publishes flow to a live subscriber (pub/sub round trip)") {
    // the reference's remote pub/sub (flight.rs publisher -> engine ->
    // subscribers): a remote session INSERTs over the wire and a
    // subscribe() stream on the topic picks the rows up. The
    // subscriber runs server-side here: a REMOTE readStream is
    // supported by Spark 4 Connect, but the connect-client jar
    // cannot load next to the server classpath in one JVM (both
    // define org.apache.spark classes — same boundary as the batch
    // client tests above, which use the isolated-classloader JDBC
    // driver; that driver has no streaming surface). The wire half
    // proven here is the publish direction; the local subscribe spec
    // (StorageSpec) covers the tail semantics.
    import spark.implicits._
    val root = Files.createTempDirectory("graft_serve4").toString
    val seed = new GraftSession(spark, root)
    val t0 = new java.sql.Timestamp(1700000000L * 1000)
    seed.publish("pubsub_t", Seq((1L, t0, 1.0)).toDF("key", "time", "v"))

    val port = freePort()
    val gs = Serve.start(spark, root, port)
    val stream = gs.subscribe("pubsub_t")
    val q = stream.writeStream.format("memory").queryName("pubsub_sink")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val conn = Connect.jdbc(s"sc://localhost:$port")
      try {
        val st = conn.createStatement()
        try st.execute(
          "INSERT INTO graft.pubsub_t VALUES (2, TIMESTAMP '2023-11-14 22:13:20', 2.0)")
        finally st.close()
      } finally conn.close()
      q.processAllAvailable()
      val n = spark.sql("SELECT count(*) FROM pubsub_sink").collect().head.getLong(0)
      assert(n == 2L, s"subscriber must see the remotely published row, saw $n")
    } finally {
      q.stop()
      Serve.shutdown(gs)
      spark.catalog.dropGlobalTempView("pubsub_t")
    }
  }

  test("a remote session creates a topic and publishes into it (remote DDL + DML)") {
    // the full remote lifecycle the reference's create_table + publish
    // flow covers (ella.rs:176-199, topic.rs:86): CREATE TABLE over
    // the wire registers a declared-schema topic in the durable
    // manifest, INSERT lands rows, and the server session reads the
    // same topic by its short name.
    val root = Files.createTempDirectory("graft_serve6").toString
    val port = freePort()
    val gs = Serve.start(spark, root, port)
    try {
      val conn = Connect.jdbc(s"sc://localhost:$port")
      try {
        val st = conn.createStatement()
        try {
          st.execute("CREATE TABLE graft.born_remote (key BIGINT, time TIMESTAMP, v DOUBLE)")
          st.execute("INSERT INTO graft.born_remote VALUES (7, TIMESTAMP '2023-11-14 22:13:20', 7.0)")
          val rs = st.executeQuery("SELECT key, v FROM graft.born_remote")
          try {
            assert(rs.next())
            assert(rs.getLong("key") == 7L && rs.getDouble("v") == 7.0)
          } finally rs.close()
        } finally st.close()
      } finally conn.close()
      // durable: registered in the manifest, visible server-side
      assert(gs.catalog.contains("born_remote"), "remote CREATE TABLE must register the topic")
      assert(gs.table("born_remote").count() == 1)
    } finally Serve.shutdown(gs)
  }

  test("same-named topics in different schemas publish under qualified views") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_serve5").toString
    val gs = new GraftSession(spark, root)
    val t0 = new java.sql.Timestamp(1700000000L * 1000)
    gs.createSchema("s1", ifNotExists = true)
    gs.createSchema("s2", ifNotExists = true)
    gs.publish("s1.dup", Seq((1L, t0, 1.0)).toDF("key", "time", "v"))
    gs.publish("s2.dup", Seq((2L, t0, 2.0)).toDF("key", "time", "v"))
    Serve.refresh(gs)
    try {
      val views = spark.sql("SHOW TABLES IN global_temp").collect().map(_.getString(1))
      assert(views.contains("ella_s1_dup") && views.contains("ella_s2_dup"),
        s"colliding simple names must publish qualified, saw: ${views.mkString(",")}")
      assert(!views.contains("dup"),
        "a bare colliding name would silently shadow one of the topics")
      assert(spark.sql("SELECT key FROM global_temp.ella_s2_dup").collect()
        .head.getLong(0) == 2L, "each qualified view reads its own topic")
    } finally {
      spark.catalog.dropGlobalTempView("ella_s1_dup")
      spark.catalog.dropGlobalTempView("ella_s2_dup")
    }
  }

  test("a remote Connect client runs SQL end-to-end against a served topic") {
    // The real client round-trip: the bundled Spark Connect JDBC
    // driver (gRPC + Arrow transport) loaded in an ISOLATED
    // classloader — client and server both define org.apache.spark
    // classes, so they must never share a loader. This is the
    // ella-cli connect / pyella flow: remote plan in, Arrow rows out.
    import spark.implicits._
    val root = Files.createTempDirectory("graft_serve2").toString
    val seed = new GraftSession(spark, root)
    val t0 = new java.sql.Timestamp(1700000000L * 1000)
    seed.publish("kv_remote", Seq((1L, t0, 10.0), (2L, t0, 32.0)).toDF("key", "time", "v"))

    val port = freePort()
    val gs = Serve.start(spark, root, port)
    try {
      val conn = Connect.jdbc(s"sc://localhost:$port")
      try {
        val st = conn.createStatement()
        val rs = st.executeQuery(
          "SELECT count(*) AS n, sum(v) AS s FROM global_temp.kv_remote")
        try {
          assert(rs.next())
          assert(rs.getLong("n") == 2L, "remote count over the served topic")
          assert(rs.getDouble("s") == 42.0, "remote aggregate over Arrow transport")
        } finally { rs.close(); st.close() }
      } finally conn.close()

      // the remote REPL drives the same wire: bounded preview out
      val out = Seq.newBuilder[String]
      val conn2 = Connect.jdbc(s"sc://localhost:$port")
      try Connect.repl(conn2,
        Iterator("SELECT key, v FROM global_temp.kv_remote ORDER BY key;",
          "SELECT broken FROM nowhere;", "\\q"),
        out += _)
      finally conn2.close()
      val printed = out.result()
      assert(printed.head.startsWith("key | v"), s"header row: $printed")
      assert(printed.head.contains("1 | 10.0"), s"data rows: $printed")
      assert(printed.exists(_.startsWith("error:")), "remote errors print, not throw")
    } finally {
      Serve.shutdown(gs)
      spark.catalog.dropGlobalTempView("kv_remote")
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Remote serve mode — the counterpart of the reference's server
  * process (`ella-cli/src/serve.rs`, `ella-server/src/server/
  * flight.rs`: a gRPC + Arrow Flight endpoint over the engine).
  *
  * Spark's native remote protocol IS gRPC + Arrow: Spark Connect.
  * Serving the engine means starting the bundled
  * `SparkConnectService` inside the session JVM; any Spark Connect
  * client (JVM, Python, Go, Rust) can then open `sc://host:port`,
  * build logical plans remotely, and stream Arrow batches back —
  * functionally what ella's Flight server does for its clients
  * (`pyella`'s connect mode, `ella-cli connect`).
  *
  * Usage: `graft.Serve <root> [port]` — opens the topic catalog at
  * `root` (same layout `graft.Shell` uses), registers its tables,
  * starts the gRPC endpoint, and blocks until killed. At scale this
  * process is the long-lived driver of a cluster app; executors do
  * the work, the gRPC plane only carries plans and results.
  */
object Serve {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(
      sys.env.getOrElse("GRAFT_ROOT", "/tmp/graft"))
    val port = args.drop(1).headOption.map(_.toInt).getOrElse(15002)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
      .appName("graft-serve")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.connect.grpc.binding.port", port)
      .getOrCreate()
    val session = start(spark, root, port, sys.env.get("GRAFT_SERVE_TOKEN"),
      metricsPort = sys.env.get("GRAFT_METRICS_PORT").map(_.toInt),
      mintSecret = sys.env.get("GRAFT_SERVE_MINT_SECRET"),
      otlpEndpoint = sys.env.get("GRAFT_OTLP_ENDPOINT"))
    println(s"graft serve: sc://localhost:$port (root=$root)")
    // SIGTERM (or any JVM exit): stop the endpoint and checkpoint the
    // catalog — the reference's ctrl-c -> rt.shutdown() path
    // (serve.rs:32-37). Note Spark claims SIGINT for job cancellation,
    // so `kill <pid>` (TERM), not ctrl-c, is the graceful stop.
    sys.addShutdownHook(shutdown(session))
    Thread.currentThread.join()
  }

  /** Start serving `spark` on `port`; returns the catalog-backed
    * session whose topics are visible to remote clients (registered
    * as global temp views, which Connect sessions resolve).
    *
    * `token`: optional pre-shared auth token — the counterpart of the
    * reference's bearer-token gate on its Flight endpoint
    * (ella-server/src/server/auth.rs: every request must carry
    * `Authorization: Bearer <token>` or is rejected UNAUTHENTICATED).
    * Spark Connect ships the same scheme natively
    * (PreSharedKeyAuthenticationInterceptor); setting the conf before
    * the service boots installs it on the gRPC server, and clients
    * authenticate via `sc://host:port/;token=<t>` (or the raw
    * Authorization header). None = open endpoint (trusted-network
    * dev mode, and the conf is explicitly cleared so a previously
    * served token does not leak into this server's lifetime).
    *
    * `metricsPort`: when set, also start a [[MetricsServer]] scrape
    * endpoint on that port (the reference serves its gauges next to
    * its Flight endpoint the same way — ella-cli/src/serve.rs boots
    * `MetricsServer::start` alongside the server; metrics/server.rs:16).
    * [[shutdown]] stops it with the service.
    *
    * `otlpEndpoint`: when set (or via `GRAFT_OTLP_ENDPOINT`), also
    * export per-action and per-micro-batch spans as OTLP/HTTP JSON —
    * the reference's collector deployment (`tracing/
    * otel-collector.yaml`) points its traces receiver at exactly this
    * wire; see [[Tracing]]. */
  def start(spark: SparkSession, root: String, port: Int,
            token: Option[String] = None,
            metricsPort: Option[Int] = None,
            mintSecret: Option[String] = None,
            otlpEndpoint: Option[String] = None): GraftSession = {
    require(token.isEmpty || mintSecret.isEmpty,
      "choose ONE auth mode: pre-shared `token` or minted-connection `mintSecret`")
    // mint mode without a handshake surface would reject every gRPC
    // call UNAUTHENTICATED with no remote way to obtain a token — an
    // unusable server unless the operator calls TokenAuth.mint()
    // in-process, which is never what a deployment wants
    require(mintSecret.isEmpty || metricsPort.nonEmpty,
      "mintSecret needs metricsPort: the POST /token handshake endpoint rides on the metrics port")
    // the service reads the port from the context's SparkConf (via
    // SparkEnv), not the SQL runtime conf — set it where it looks
    token match {
      case Some(t) =>
        require(t.nonEmpty, "serve auth token must be non-empty (use None for an open endpoint)")
        org.apache.spark.SparkEnv.get.conf
          .set("spark.connect.authenticate.token", t)
      case None => org.apache.spark.SparkEnv.get.conf
        .remove("spark.connect.authenticate.token")
    }
    // minted-connection auth (the reference's full auth stack —
    // handshake-issued HMAC tokens, revocable per connection id; see
    // [[TokenAuth]]): the interceptor class installs on the Connect
    // gRPC server; it pass-throughs while TokenAuth is uninstalled,
    // so the conf can stay across serve restarts in one JVM.
    mintSecret match {
      case Some(s) =>
        TokenAuth.install(s)
        org.apache.spark.SparkEnv.get.conf
          .set("spark.connect.grpc.interceptor.classes",
            classOf[GraftAuthInterceptor].getName)
      case None => TokenAuth.uninstall()
    }
    org.apache.spark.SparkEnv.get.conf.set("spark.connect.grpc.binding.port", port.toString)
    val gs = new GraftSession(spark, root)
    // writable surface: topics resolve as `graft.<topic>` in every
    // Connect session, and INSERT INTO lands through the store with
    // server-derived bucketing — the reference's remote publish path
    // (flight.rs:492 do_put_statement_update; pyella publisher flow)
    gs.registerSparkCatalog()
    refresh(gs)
    org.apache.spark.sql.connect.service.SparkConnectService.start(spark.sparkContext)
    // a re-start must not leak the previous endpoint's port/listeners
    metrics.foreach(_.stop())
    metrics = metricsPort.map { mp =>
      // mint mode: the metrics endpoint doubles as the handshake
      // surface (POST /token gated by the admin secret)
      val h = MetricsServer.start(spark, mp, adminSecret = mintSecret)
      println(s"graft metrics: http://localhost:${h.port}/metrics")
      h
    }
    tracing.foreach(_.stop())
    tracing = otlpEndpoint.map(Tracing.start(spark, _))
    gs
  }

  // serve-lifetime scrape endpoint, if requested; stopped in shutdown()
  @volatile private var metrics: Option[MetricsServer.Handle] = None
  // serve-lifetime OTLP span exporter, if requested; stopped in shutdown()
  @volatile private var tracing: Option[Tracing.Handle] = None

  /** (Re-)publish the catalog's topics to remote clients. Connect
    * clients get ISOLATED SparkSessions over the same SparkContext;
    * plain temp views would be invisible to them — global temp views
    * are the cross-session publication surface. Call again after
    * creating topics on a live server.
    *
    * Topics whose simple name is unique publish under it; same-named
    * topics in different schemas would silently shadow each other
    * (last listing wins), so colliding names publish under the
    * underscore-qualified FQN instead — every topic stays reachable.
    * (The V2 catalog surface, `graft.<topic>`, is collision-free by
    * construction and is the writable path.) */
  def refresh(gs: GraftSession): Unit = {
    val topics = gs.catalog.list().collect { case (name, "topic") => name }
    val bySimple = topics.groupBy(_.split('.').last)
    bySimple.foreach { case (simple, fqns) =>
      if (fqns.size == 1)
        gs.table(fqns.head).createOrReplaceGlobalTempView(simple)
      else fqns.foreach { fqn =>
        gs.table(fqn).createOrReplaceGlobalTempView(fqn.replace('.', '_'))
      }
    }
  }

  def shutdown(session: GraftSession): Unit = {
    tracing.foreach(_.stop()); tracing = None
    metrics.foreach(_.stop()); metrics = None
    org.apache.spark.sql.connect.service.SparkConnectService.stop(None, None)
    session.shutdown()
  }
}

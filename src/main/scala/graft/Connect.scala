package graft

/** Remote client mode — the counterpart of the reference CLI's
  * `connect` (ella-cli/src/connect.rs: dial a running server, run
  * queries over its Flight transport).
  *
  * The transport is Spark Connect's JDBC driver (gRPC + Arrow result
  * batches). The client and server halves of Spark Connect both
  * define `org.apache.spark.*` classes, so the driver is loaded in an
  * ISOLATED classloader built from the client jars that ship next to
  * the Spark distribution — the embedding application's own Spark
  * classpath is never touched. One loader is built per JVM and
  * reused.
  */
object Connect {

  /** Directories scanned for the Connect client jars and their
    * (isolated) dependencies. Override with GRAFT_CONNECT_JARS
    * (colon-separated dirs) when the Spark distribution lives
    * elsewhere. */
  private def jarDirs: Seq[String] =
    sys.env.get("GRAFT_CONNECT_JARS").map(_.split(':').toSeq)
      .getOrElse(Seq("/opt/spark/jars/connect-repl", "/opt/spark/jars"))

  // Prefixes of jars the shaded client actually needs. Everything is
  // loaded with the PLATFORM classloader as parent, so none of these
  // classes can collide with (or see) the application's Spark.
  private val clientJarPrefixes = Seq(
    "spark-connect-client", "spark-common-utils", "spark-sql-api",
    "spark-unsafe", "scala-library", "scala-reflect", "slf4j-api",
    "log4j-", "jackson-", "json4s-", "commons-lang3", "commons-text",
    "arrow-", "flatbuffers", "netty-", "antlr4-runtime", "icu4j",
    "kryo", "minlog", "objenesis", "paranamer")

  private lazy val loader: ClassLoader = {
    val urls = jarDirs.flatMap { d =>
      val dir = new java.io.File(d)
      Option(dir.listFiles()).toSeq.flatten
        .filter(f => f.getName.endsWith(".jar") &&
          clientJarPrefixes.exists(f.getName.startsWith))
        .map(_.toURI.toURL)
    }
    require(urls.exists(_.toString.contains("spark-connect-client-jdbc")),
      s"Spark Connect JDBC client jar not found under ${jarDirs.mkString(":")} " +
        "(set GRAFT_CONNECT_JARS)")
    new java.net.URLClassLoader(urls.toArray, ClassLoader.getPlatformClassLoader)
  }

  /** Open a JDBC connection to a graft serve endpoint.
    * `url` is `sc://host:port` or a full `jdbc:sc://...`. */
  def jdbc(url: String): java.sql.Connection = {
    val full = if (url.startsWith("jdbc:")) url else s"jdbc:$url"
    val driver = Class.forName(
      "org.apache.spark.sql.connect.client.jdbc.SparkConnectDriver", true, loader)
      .getDeclaredConstructor().newInstance().asInstanceOf[java.sql.Driver]
    val conn = driver.connect(full, new java.util.Properties())
    require(conn != null, s"driver rejected url $full")
    conn
  }

  /** Remote REPL: read SQL lines, execute on the server, print
    * bounded previews — `Shell` semantics over the wire. */
  private[graft] def repl(conn: java.sql.Connection, lines: Iterator[String],
                          out: String => Unit, maxRows: Int = 50): Unit = {
    var live = true
    while (live && lines.hasNext) {
      val raw = lines.next().trim.stripSuffix(";").trim
      raw match {
        case "" => ()
        case "\\q" => live = false
        case "\\h" => out("\\q quit | \\h help | <sql>; runs remotely")
        case sql =>
          val st = conn.createStatement()
          try {
            val rs = st.executeQuery(sql)
            try out(render(rs, maxRows)) finally rs.close()
          } catch {
            case e: Exception =>
              out(s"error: ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName).linesIterator.take(1).mkString}")
          } finally st.close()
      }
    }
  }

  private def render(rs: java.sql.ResultSet, maxRows: Int): String = {
    val md = rs.getMetaData
    val n = md.getColumnCount
    val header = (1 to n).map(md.getColumnLabel).mkString(" | ")
    val body = Seq.newBuilder[String]
    var count = 0
    while (count < maxRows && rs.next()) {
      body += (1 to n).map(i => Option(rs.getObject(i)).map(_.toString).getOrElse("NULL"))
        .mkString(" | ")
      count += 1
    }
    val more = if (count == maxRows && rs.next()) s"\n... (truncated at $maxRows rows)" else ""
    (header +: body.result()).mkString("\n") + more
  }

  /** `graft.Connect sc://host:port` — remote shell over stdin. */
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Connect sc://host:port")
    val conn = jdbc(args(0))
    try repl(conn, scala.io.Source.stdin.getLines(), println(_))
    finally conn.close()
  }
}

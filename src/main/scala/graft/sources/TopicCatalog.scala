package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import scala.collection.mutable

/** Catalog → schema → table registry with a durable JSON manifest —
  * the Spark counterpart of ella's registry + transaction snapshot
  * (ella-engine/src/registry.rs, registry/snapshot.rs, catalog.rs).
  *
  * Tables are ella's two kinds (README.md "Concepts"):
  *  - topics: parquet-backed append streams ([[TopicStore]] paths)
  *  - views: named queries, recomputed per scan, or materialized to
  *    parquet (ella-engine/src/table/view.rs, lazy/view.rs)
  */
class TopicCatalog(spark: SparkSession, root: String,
                   defaultCatalog: String = "ella", defaultSchema: String = "public") {

  sealed trait Entry { def kind: String }
  case class Topic(path: String) extends Entry { val kind = "topic" }
  case class View(sql: String, materializedPath: Option[String]) extends Entry {
    val kind = if (materializedPath.isDefined) "materialized_view" else "view"
  }

  private val manifestPath = Paths.get(s"$root/_graft_catalog.json")
  private val entries = mutable.LinkedHashMap[String, Entry]()
  load()

  /** Fully-qualified id; bare names resolve in the default schema
    * (ella/src/ella.rs:153-162 default catalog/schema). */
  def resolve(ref: String): String = ref.split('.') match {
    case Array(t) => s"$defaultCatalog.$defaultSchema.$t"
    case Array(s, t) => s"$defaultCatalog.$s.$t"
    case _ => ref
  }

  def createTopic(ref: String, store: TopicStore): Unit = {
    entries(resolve(ref)) = Topic(store.topicPath(resolve(ref)))
    save()
  }

  def createView(ref: String, sql: String): Unit = {
    entries(resolve(ref)) = View(sql, None)
    save()
  }

  /** Materialize a view's current result to parquet (LazyToView /
    * `create_view` with materialization in the reference). */
  def materializeView(ref: String, sql: String): Unit = {
    val path = s"$root/_materialized/${resolve(ref)}"
    spark.sql(sql).write.mode(SaveMode.Overwrite).parquet(path)
    entries(resolve(ref)) = View(sql, Some(path))
    save()
  }

  def dropTable(ref: String): Boolean = {
    val r = entries.remove(resolve(ref)).isDefined
    if (r) save()
    r
  }

  def list(): Seq[(String, String)] = entries.toSeq.map { case (n, e) => (n, e.kind) }

  /** Scan a table: topic => parquet read; view => run the SQL (or read
    * the materialization). */
  def table(ref: String): DataFrame = entries(resolve(ref)) match {
    case Topic(path) => spark.read.parquet(path)
    case View(sql, None) => spark.sql(sql)
    case View(_, Some(path)) => spark.read.parquet(path)
  }

  def contains(ref: String): Boolean = entries.contains(resolve(ref))

  // -- manifest persistence (JSON, human-readable, append-safe) --

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case '\r' => "\\r"; case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  }

  private def save(): Unit = {
    val body = entries.map {
      case (n, Topic(p)) => s"""  "${esc(n)}": {"kind": "topic", "path": "${esc(p)}"}"""
      case (n, View(sql, mp)) =>
        val m = mp.map(p => s""", "path": "${esc(p)}"""").getOrElse("")
        s"""  "${esc(n)}": {"kind": "view", "sql": "${esc(sql)}"$m}"""
    }.mkString("{\n", ",\n", "\n}\n")
    Files.createDirectories(manifestPath.getParent)
    Files.writeString(manifestPath, body,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  private def load(): Unit = {
    if (!Files.exists(manifestPath)) return
    // Minimal parser for the format save() writes (one entry per line).
    val EntryRe = """\s*"(.*?)":\s*\{"kind":\s*"(topic|view)",\s*(?:"path":\s*"(.*?)")?(?:"sql":\s*"(.*?)")?(?:,\s*"path":\s*"(.*?)")?\}.*""".r
    Files.readAllLines(manifestPath).forEach {
      case EntryRe(name, "topic", path, _, _) => entries(name) = Topic(path)
      case EntryRe(name, "view", _, sql, mp) => entries(name) = View(sql, Option(mp))
      case _ => ()
    }
  }
}

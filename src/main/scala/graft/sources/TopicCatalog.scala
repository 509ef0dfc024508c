package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType
import scala.collection.mutable

/** Catalog → schema → table registry with a durable JSON manifest —
  * the Spark counterpart of ella's registry + transaction snapshot
  * (ella-engine/src/registry.rs, registry/snapshot.rs, catalog.rs).
  *
  * Tables are ella's kinds (README.md "Concepts"):
  *  - topics: parquet-backed append streams ([[TopicStore]] paths)
  *  - temporary topics: session-scoped, never persisted to the
  *    manifest (README "Concepts": "temporary topics are not stored";
  *    ella-engine/src/table/config.rs `temporary`)
  *  - views: named queries, recomputed per scan, or materialized to
  *    parquet (ella-engine/src/table/view.rs, lazy/view.rs)
  *
  * Durability: every mutation rewrites the full snapshot through a
  * temp file + atomic rename, so a crash mid-commit leaves either the
  * old or the new manifest — never a torn one (the reference gets the
  * same guarantee from its transaction log + snapshot pair). The
  * manifest is real JSON written AND parsed with jackson (already on
  * the Spark classpath), so view SQL containing quotes, newlines, or
  * any other escape survives a reload byte-for-byte.
  */
class TopicCatalog(spark: SparkSession, root: String,
                   defaultCatalog: String = "ella", defaultSchema: String = "public") {

  sealed trait Entry { def kind: String }
  case class Topic(path: String) extends Entry { val kind = "topic" }
  /** Session-scoped topic: lives only in this catalog instance, never
    * written to the manifest. */
  case class TempTopic(df: DataFrame) extends Entry { val kind = "temp_topic" }
  case class View(sql: String, materializedPath: Option[String]) extends Entry {
    val kind = if (materializedPath.isDefined) "materialized_view" else "view"
  }

  private val manifestPath = Paths.get(s"$root/_graft_catalog.json")
  private val entries = mutable.LinkedHashMap[String, Entry]()
  load()

  // -- catalog/schema context (ella/src/ella.rs:118-137
  //    `use_catalog` / `use_schema`) --

  private var curCatalog = defaultCatalog
  private var curSchema = defaultSchema
  def useCatalog(c: String): Unit = { require(c.nonEmpty); curCatalog = c }
  def useSchema(s: String): Unit = { require(s.nonEmpty); curSchema = s }
  def currentCatalog: String = curCatalog
  def currentSchema: String = curSchema

  /** Fully-qualified id; bare names resolve in the CURRENT schema and
    * catalog (ella/src/ella.rs:153-162). */
  def resolve(ref: String): String = ref.split('.') match {
    case Array(t) => s"$curCatalog.$curSchema.$t"
    case Array(s, t) => s"$curCatalog.$s.$t"
    case _ => ref
  }

  /** Explicit topic creation (ella/src/ella.rs:176-199 `create_table`
    * with if_not_exists / or_replace):
    *  - an optional explicit schema is committed by writing an empty
    *    parquet dataset at the topic path, so readers see the declared
    *    schema before the first publish (instead of inferring from
    *    whatever arrives first);
    *  - `ifNotExists` makes an existing topic a no-op;
    *  - `orReplace` drops and recreates;
    *  - neither → error on conflict, like the reference.
    */
  def createTopic(ref: String, store: TopicStore,
                  schema: Option[StructType] = None,
                  ifNotExists: Boolean = false,
                  orReplace: Boolean = false): Unit = {
    val fqn = resolve(ref)
    if (entries.contains(fqn)) {
      if (ifNotExists) return
      if (!orReplace) throw new IllegalStateException(s"table already exists: $fqn")
    }
    val path = store.topicPath(fqn)
    schema.foreach { sc =>
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sc)
        .write.mode(SaveMode.Overwrite).parquet(path)
    }
    entries(fqn) = Topic(path)
    save()
  }

  /** Temporary topic: registered for query resolution, never persisted
    * (dropped with the session, like the reference's `temporary`
    * table config). */
  def createTempTopic(ref: String, df: DataFrame): Unit =
    entries(resolve(ref)) = TempTopic(df)

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
    val removed = entries.remove(resolve(ref))
    if (removed.exists(_.kind != "temp_topic")) save()
    removed.isDefined
  }

  def list(): Seq[(String, String)] = entries.toSeq.map { case (n, e) => (n, e.kind) }

  /** Scan a table: topic => parquet read; temp topic => its plan;
    * view => run the SQL (or read the materialization). */
  def table(ref: String): DataFrame = entries(resolve(ref)) match {
    case Topic(path) => spark.read.parquet(path)
    case TempTopic(df) => df
    case View(sql, None) => spark.sql(sql)
    case View(_, Some(path)) => spark.read.parquet(path)
  }

  def contains(ref: String): Boolean = entries.contains(resolve(ref))

  // -- manifest persistence: real JSON via jackson, atomic snapshot --

  // lazy: load() runs from the constructor, before plain vals declared
  // below the `load()` call would be initialized
  private lazy val mapper = new ObjectMapper()

  private def save(): Unit = {
    val doc = mapper.createObjectNode()
    entries.foreach {
      case (_, TempTopic(_)) => () // session-only, never durable
      case (n, Topic(p)) =>
        val o = doc.putObject(n); o.put("kind", "topic"); o.put("path", p)
      case (n, View(sql, mp)) =>
        val o = doc.putObject(n); o.put("kind", "view"); o.put("sql", sql)
        mp.foreach(o.put("path", _))
    }
    Files.createDirectories(manifestPath.getParent)
    val tmp = manifestPath.resolveSibling(manifestPath.getFileName.toString + ".tmp")
    Files.writeString(tmp, mapper.writerWithDefaultPrettyPrinter().writeValueAsString(doc),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, manifestPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def load(): Unit = {
    if (!Files.exists(manifestPath)) return
    val doc = mapper.readTree(Files.readString(manifestPath))
    doc.properties().forEach { e =>
      val name = e.getKey
      val node: JsonNode = e.getValue
      node.path("kind").asText() match {
        case "topic" => entries(name) = Topic(node.path("path").asText())
        case "view" =>
          val mp = Option(node.get("path")).map(_.asText())
          entries(name) = View(node.path("sql").asText(), mp)
        case _ => ()
      }
    }
  }
}

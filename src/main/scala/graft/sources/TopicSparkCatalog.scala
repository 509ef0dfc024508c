package graft.sources

import java.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The graft datastore as a Spark DataSource V2 catalog — the REMOTE
  * WRITE surface matching the reference's server-side publish path
  * (`ella-engine/src/table/topic.rs:86` `publish() -> Publisher`,
  * exposed over Flight by `ella-server/src/server/flight.rs:492`
  * `do_put_statement_update`: a client sends `INSERT INTO topic …`
  * and the SERVER routes it into the topic's shard writer).
  *
  * Registered via
  * `spark.sql.catalog.<name> = graft.sources.TopicSparkCatalog` +
  * `spark.sql.catalog.<name>.root = <datastore root>`, topics become
  * first-class Spark tables: ANY session over this SparkContext —
  * including the ISOLATED sessions Spark Connect creates per remote
  * client — resolves `<name>.<topic>` for both `SELECT` and
  * `INSERT INTO`, because catalog-plugin resolution reads the shared
  * conf rather than session-local temp views. That makes
  * `INSERT INTO graft.mytopic SELECT …` from a remote `pyspark
  * .remote()` / JDBC client land in the topic's bucketed parquet
  * layout with the bucket DERIVED from the time column server-side —
  * clients cannot break the bucket/time invariant — and the topic's
  * registered [[CompactionPolicy]] honored after every insert.
  *
  * Reads delegate to Spark's own parquet V2 table, so remote scans
  * get the stock pushdown/pruning machinery (the `bucket` partition
  * column included); writes use the V1 fallback hook
  * ([[org.apache.spark.sql.connector.write.V1Write]]), which hands
  * the insert a driver-side DataFrame — exactly the arity
  * [[TopicStore.append]] wants, with none of the per-partition
  * writer plumbing a full V2 BatchWrite would duplicate for no
  * distributed benefit (the append itself is already a
  * partition-parallel parquet write).
  */
class TopicSparkCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = "graft"
  private var root: String = _
  @volatile private var cached: Option[TopicCatalog] = None

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(throw new IllegalArgumentException(
      s"spark.sql.catalog.$name.root must point at a graft datastore root"))
  }

  override def name(): String = catalogName

  private def session = org.apache.spark.sql.classic.SparkSession.active
  private def store = new TopicStore(session, s"$root/topics")

  /** Manifest view. Reloaded on lookup miss (and for listings), so
    * topics created by OTHER sessions after this plugin instantiated
    * still resolve — the manifest on disk is the source of truth,
    * this instance only caches it. */
  private def topicCatalog(reload: Boolean): TopicCatalog = synchronized {
    if (reload || cached.isEmpty) cached = Some(new TopicCatalog(session, root))
    cached.get
  }

  private def fqnOf(ident: Identifier, tc: TopicCatalog): String =
    tc.resolve((ident.namespace :+ ident.name).mkString("."))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val tc = topicCatalog(reload = true)
    val prefix = namespace.mkString(".")
    tc.list().collect {
      case (fqn, "topic") if prefix.isEmpty || fqn.startsWith(prefix + ".") =>
        val parts = fqn.split('.')
        Identifier.of(parts.dropRight(1), parts.last)
    }.toArray
  }

  override def loadTable(ident: Identifier): Table = {
    def lookup(tc: TopicCatalog): Option[TopicTable] = {
      val fqn = fqnOf(ident, tc)
      if (tc.contains(fqn)) Some(new TopicTable(fqn, store, tc)) else None
    }
    lookup(topicCatalog(reload = false)).orElse(lookup(topicCatalog(reload = true)))
      .getOrElse(throw new NoSuchTableException(ident))
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft topics are time-bucketed automatically; explicit PARTITIONED BY is not supported")
    val tc = topicCatalog(reload = true)
    val fqn = fqnOf(ident, tc)
    tc.createTopic(fqn, store, Option(schema).filter(_.nonEmpty))
    new TopicTable(fqn, store, tc)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER TABLE is not supported for graft topics (publishers evolve schemas additively)")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME TABLE is not supported for graft topics")

  override def dropTable(ident: Identifier): Boolean = {
    val tc = topicCatalog(reload = true)
    tc.dropTable(fqnOf(ident, tc))
  }

  // -- namespaces: the reference's cluster→catalog→schema levels
  //    (cluster.rs:42-90, catalog.rs:48-113) surfaced through Spark's
  //    SHOW/CREATE/DROP NAMESPACE so remote sessions manage them over
  //    the wire like any other catalog object --

  /** Registered namespace keys plus namespaces implied by topic FQNs
    * (a topic at ella.public.t implies [ella] and [ella, public]). */
  private def allNamespaces(tc: TopicCatalog): Seq[Seq[String]] = {
    val fromEntries = tc.list().flatMap {
      case (name, "namespace") => Seq(name.split('.').toSeq)
      case (name, "topic") =>
        val parts = name.split('.').toSeq.dropRight(1)
        (1 to parts.length).map(parts.take)
      case _ => Seq.empty
    }
    fromEntries.distinct
  }

  override def listNamespaces(): Array[Array[String]] =
    allNamespaces(topicCatalog(reload = true))
      .filter(_.length == 1).map(_.toArray).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val tc = topicCatalog(reload = true)
    val all = allNamespaces(tc)
    if (namespace.nonEmpty && !all.exists(_ == namespace.toSeq))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        name() +: namespace.toSeq)
    all.filter(ns => ns.length == namespace.length + 1 && ns.startsWith(namespace.toSeq))
      .map(_.toArray).toArray
  }

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!allNamespaces(topicCatalog(reload = true)).exists(_ == namespace.toSeq))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        name() +: namespace.toSeq)
    util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    val tc = topicCatalog(reload = true)
    namespace.toSeq match {
      case Seq(cat) => tc.createCatalog(cat)
      case Seq(cat, sch) => tc.createSchema(s"$cat.$sch")
      case other => throw new IllegalArgumentException(
        s"graft namespaces are catalog or catalog.schema, got ${other.mkString(".")}")
    }
  }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE is not supported for graft")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val tc = topicCatalog(reload = true)
    namespace.toSeq match {
      case Seq(cat) => tc.dropCatalog(cat, ifExists = false, cascade = cascade)
      case Seq(cat, sch) => tc.dropSchema(s"$cat.$sch", ifExists = false, cascade = cascade)
      case other => throw new IllegalArgumentException(
        s"graft namespaces are catalog or catalog.schema, got ${other.mkString(".")}")
    }
  }
}

/** One topic as a V2 table: reads via Spark's parquet table over the
  * topic path (partition pruning on `bucket` included), writes via
  * the V1 insert hook into [[TopicStore.append]].
  *
  * `ACCEPT_ANY_SCHEMA` is declared so INSERTs arrive without the
  * synthetic `bucket` partition column (it is server-derived from
  * `time`, never client-supplied); the insert path itself aligns the
  * incoming frame to the topic schema by NAME when the names match,
  * by POSITION otherwise (the `VALUES (…)` arrival shape), and
  * rejects anything else loudly. */
class TopicTable(fqn: String, store: TopicStore, catalog: TopicCatalog)
  extends Table with SupportsRead with SupportsWrite {

  private def session = org.apache.spark.sql.classic.SparkSession.active

  private lazy val delegate: ParquetTable = ParquetTable(
    fqn, session, CaseInsensitiveStringMap.empty(),
    Seq(store.topicPath(fqn)), None, classOf[ParquetFileFormat])

  override def name(): String = fqn

  override def schema(): StructType = delegate.schema

  override def partitioning(): Array[Transform] = delegate.partitioning()

  override def properties(): util.Map[String, String] = util.Collections.emptyMap()

  override def capabilities(): util.Set[TableCapability] = {
    val s = new util.HashSet[TableCapability]()
    s.add(TableCapability.BATCH_READ)
    s.add(TableCapability.V1_BATCH_WRITE)
    s.add(TableCapability.ACCEPT_ANY_SCHEMA)
    s
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap) =
    delegate.newScanBuilder(options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = new WriteBuilder {
    override def build(): Write = new V1Write {
      override def toInsertableRelation: InsertableRelation = new InsertableRelation {
        override def insert(data: DataFrame, overwrite: Boolean): Unit = {
          if (overwrite) throw new UnsupportedOperationException(
            s"graft topics are append-only; INSERT OVERWRITE $fqn is not supported")
          // a topic that has never been written has no parquet footer
          // to infer from: the first insert defines the schema, same
          // contract as publish() on a fresh topic
          val tableFields =
            try Some(schema().fields.filterNot(_.name == "bucket").toSeq)
            catch { case _: Exception => None }
          val aligned = tableFields match {
            case None => data
            case Some(fields) =>
              val want = fields.map(_.name)
              val byName =
                if (want.forall(data.columns.contains)) data
                else if (data.columns.length == want.length) data.toDF(want: _*)
                else throw new IllegalArgumentException(
                  s"INSERT into $fqn: expected columns (${want.mkString(", ")}); " +
                    s"got (${data.columns.mkString(", ")})")
              byName.select(fields.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
          }
          store.append(fqn, aligned)
          // seed/maintain the manifest's column record (schema
          // evolution tracking): INSERT aligns to the table schema so
          // it can never EVOLVE a topic, but a remote-first topic's
          // column set should still be on record for later publishes
          catalog.recordSchema(fqn, aligned.columns.toSeq)
          CompactionScheduler.afterAppend(store, catalog, fqn)
        }
      }
    }
  }
}

package graft.sources

/** JVM-wide publish-cadence compaction scheduler — the shared
  * counterpart of the reference's background shard maintenance
  * (ella-engine/src/table/topic/shard/compact.rs fires as shards
  * seal, driven by the table's own config). Every write surface that
  * appends to a topic — [[graft.GraftSession.publish]], the
  * [[TopicSparkCatalog]] V2 `INSERT INTO` path used by remote
  * Connect sessions, streaming foreachBatch sinks — funnels through
  * [[afterAppend]], so the topic's registered cadence is honored no
  * matter which session in this driver JVM wrote.
  *
  * Counters are keyed by the topic's STORAGE PATH (root-qualified),
  * not its name: two datastores with a same-named topic must not
  * share a cadence. Session-local state is a rate limiter, not
  * durable state — after a restart the first due check happens up to
  * `everyAppends` publishes later, and compaction itself is
  * idempotent (sealed compact buckets are never rewritten).
  */
object CompactionScheduler {
  private val appendsSinceCheck =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Bump the topic's append counter; when the registered cadence is
    * due, run its compaction pass and return the compacted buckets.
    * The atomic bump-and-wrap elects exactly ONE compactor among
    * concurrent publishers (appends themselves are coordinated with
    * the compactor by the per-topic lock inside [[TopicStore]]). */
  def afterAppend(store: TopicStore, catalog: TopicCatalog, fqn: String): Seq[Long] =
    catalog.compaction(fqn) match {
      case Some(p) =>
        val key = store.topicPath(fqn)
        val due = appendsSinceCheck.compute(key, (_, v) => {
          val n = (if (v == null) 0 else v.intValue) + 1
          if (n >= p.everyAppends) 0 else n
        }) == 0
        if (due) store.compact(fqn, p.maxFilesPerBucket, p.clusterBy,
          p.minShardBytes, p.targetShardBytes, p.zorder)
        else Seq.empty
      case None => Seq.empty
    }
}

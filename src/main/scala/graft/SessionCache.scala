package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Session-scoped memoization with eviction when the session's context
  * shuts down (ADVICE r12: caches keyed by SparkSession in plain TrieMaps
  * outlive stopped sessions and pin cached/checkpointed block references
  * for the JVM lifetime in multi-session processes). First use from a
  * session installs one SparkListener on that session's context; on
  * application end every entry keyed by the session is dropped, releasing
  * the DataFrame references so the blocks (already gone with the context)
  * and plans can be garbage-collected.
  *
  * The values memoized through this cache are bounded by construction —
  * table readers (a plan, not data), persisted layer frames, trained
  * model frames — never corpus-sized driver data.
  */
object SessionCache {

  private val store =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, Any), Any]
  private val hooked = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean])

  private def hook(s: SparkSession): Unit =
    if (hooked.add(s)) {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
          evict(s)
      })
    }

  /** Drop every entry keyed by `s` — the application-end listener's body,
    * callable directly so the eviction path is unit-testable without
    * stopping the suite's shared context (SessionCacheSpec). */
  private[graft] def evict(s: SparkSession): Unit = {
    store.keys.iterator.filter(_._1 eq s).foreach(store.remove)
    hooked.remove(s)
  }

  /** Entry count for `s` (test observability). */
  private[graft] def entriesFor(s: SparkSession): Int =
    store.keys.count(_._1 eq s)

  /** Memoize `mk` under (session, key). `mk` may run more than once under
    * concurrent first access (TrieMap getOrElseUpdate is not atomic for
    * side effects) — every memoized builder here is idempotent. */
  def getOrElseUpdate[V](s: SparkSession, key: Any)(mk: => V): V = {
    hook(s)
    store.getOrElseUpdate((s, key), mk).asInstanceOf[V]
  }

  /** Memoized layer with [[LayerMetrics]] accounting: hits record a reuse,
    * misses run `mk` under the named build timer. The shared shape of the
    * mart/gram/pair/vocab layer caches (SURVEY §4's materialize-once
    * posture), now with session-end eviction in one place. */
  def layer[V](name: String, s: SparkSession, key: Any)(mk: => V): V = {
    hook(s)
    store.get((s, (name, key))) match {
      case Some(v) => LayerMetrics.reuse(name); v.asInstanceOf[V]
      case None =>
        store.getOrElseUpdate((s, (name, key)), LayerMetrics.build(name)(mk))
          .asInstanceOf[V]
    }
  }
}

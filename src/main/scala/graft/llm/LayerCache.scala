package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-(name, session, dir) persisted result layers — the generalization
  * of the gram/pair caches in [[TextDedup]] and the mart layer cache in
  * [[graft.SparkEntry]]: when two registered queries consume the same
  * bounded intermediate (an ANN method's top-k frame feeds both its own
  * query and `ann_recall_audit`), a production pipeline materializes it
  * once and fans out. Frames cached here must be bounded (Q·k rows for
  * the ANN family), never corpus-sized. */
private[llm] object LayerCache {
  // backed by SessionCache so entries evict with the session's context
  // (ADVICE r12)
  def of(name: String, s: SparkSession, d: String)(mk: => DataFrame): DataFrame =
    graft.SessionCache.layer(name, s, d) {
      val df = mk.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    }
}

package graft

/** Pins the SessionCache eviction contract (VERDICT r13 #7): layer/model
  * caches are keyed by (session, key) and must not outlive their session
  * in a multi-session process — entries pin DataFrame references whose
  * cached/checkpointed blocks would otherwise leak conceptually (the
  * blocks themselves die with the context; the references and plans
  * should too). The application-end listener's body is exercised
  * directly (stopping the suite's shared context would take every other
  * suite down with it); the listener registration itself is one
  * addSparkListener call on first use.
  */
class SessionCacheSpec extends SparkSpec {

  test("session entries evict on application end and are isolated per session") {
    val child = spark.newSession()
    // populate entries for BOTH sessions, same key
    var builds = 0
    def build(): Int = { builds += 1; builds }
    val a1 = SessionCache.layer("spec_probe", spark, "k")(build())
    val c1 = SessionCache.layer("spec_probe", child, "k")(build())
    assert(a1 !== c1, "sessions must not share cache entries")
    assert(SessionCache.entriesFor(child) === 1)
    // memoized: no rebuild on re-read
    assert(SessionCache.layer("spec_probe", child, "k")(build()) === c1)
    assert(builds === 2)
    // application end for the child: its entries drop, the parent's stay
    val parentEntries = SessionCache.entriesFor(spark)
    SessionCache.evict(child)
    assert(SessionCache.entriesFor(child) === 0)
    assert(SessionCache.entriesFor(spark) === parentEntries)
    // a fresh build after eviction runs the builder again (no stale ref)
    assert(SessionCache.layer("spec_probe", child, "k")(build()) === 3)
    SessionCache.evict(child)
  }

  test("a layer frame whose persist registration was dropped re-persists on hit") {
    // r14's order-dependent ContractSpec failure: clearCache() drops the
    // CacheManager REGISTRATION of a memoized layer frame, but the memo
    // keeps handing the frame out and the builder (a memo hit) never
    // re-persists — every consumer then silently recomputes the layer
    // from source for the rest of the session. The layer() hit path must
    // self-heal: re-assert the storage level recorded at build time.
    import org.apache.spark.storage.StorageLevel
    val df = SessionCache.layer("heal_probe", spark, sf) {
      val d = spark.range(100).toDF("n")
        .persist(StorageLevel.MEMORY_AND_DISK)
      d.count()
      d
    }
    assert(df.storageLevel === StorageLevel.MEMORY_AND_DISK)
    spark.catalog.clearCache()
    assert(df.storageLevel === StorageLevel.NONE, "clearCache drops the registration")
    val hit = SessionCache.layer("heal_probe", spark, sf) {
      fail("builder must not re-run on a memo hit"); df
    }
    assert(hit.storageLevel === StorageLevel.MEMORY_AND_DISK,
      "hit path must re-persist at the recorded level")
    hit.unpersist(false)
  }
}

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
}

package graft

import org.apache.spark.storage.StorageLevel

import graft.ext.Similarity

/** Session-memo lifecycle: the per-corpus cached frames must be
  * evictable (a long-lived session over many corpora must not pin one
  * block set per corpus forever) and must rebuild lazily after eviction.
  */
class CachesSpec extends SparkSpec {

  test("clearAll unpersists memoized frames; memos rebuild and re-cache on next touch") {
    val dir = "/root/testdata/sf0.001"
    val df = Similarity.sharedVecFrame(spark, dir)
    df.count()
    assert(df.storageLevel.useMemory,
      "the shared vector frame must be cached after first touch")
    Caches.clearAll()
    assert(df.storageLevel == StorageLevel.NONE,
      "clearAll must unpersist the memoized frame")
    val df2 = Similarity.sharedVecFrame(spark, dir)
    assert(df2 ne df, "the memo must have been dropped, not just unpersisted")
    df2.count()
    assert(df2.storageLevel.useMemory, "a fresh touch re-memoizes and re-caches")
    Caches.clearAll()
  }

  test("clearAll on cold memos is a no-op, and queries still run after eviction") {
    Caches.clearAll()
    Caches.clearAll() // idempotent
    val out = Similarity.queries("q_knn_ivf")(spark, "/root/testdata/sf0.001")
    assert(out.count() > 0, "memoized queries must rebuild after eviction")
    Caches.clearAll()
  }
}

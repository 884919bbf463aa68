package graft

/** Session-memo lifecycle. Several modules memoize per-corpus-dir
  * DataFrames backed by executor storage (`.cache()` /
  * `localCheckpoint()`) — the production "persist the shared frame once"
  * shape, and the right default while a session works one corpus. A
  * long-lived session crossing MANY corpora, though, would pin one
  * cached block set per corpus forever; this is the explicit evict hook
  * for that boundary.
  *
  * `clearAll()` asks each memoizing module to unpersist its cached
  * frames and drop the memo references (localCheckpoint-backed frames
  * free their RDD blocks via the ContextCleaner once unreferenced).
  * Wired into Bench/Verify teardown; callable any time — the memos
  * rebuild lazily on next touch.
  */
object Caches {
  def clearAll(): Unit = {
    ext.Similarity.clearCaches()
    ext.Multimodal.clearCaches()
    ext.Dedup.clearCaches()
    streaming.Streams.clearCaches()
    ext.TextOps.clearCaches()
    ml.PriceModel.clearCache()
  }
}

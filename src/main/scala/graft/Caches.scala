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
  /** QUERY-scope memos only: the shared frames/codebooks/models that
    * queries build on first touch. Evicting these makes the next
    * toucher pay the real build cost again — what the bench's
    * between-sweep eviction uses so medians stay honest — while the
    * `prepare()`-built ETL artifacts (the streaming admission index,
    * staged landing dirs) stay resident: those are excluded from query
    * time by design, exactly like `Layout.prepare`'s table builds.
    */
  def clearQueryMemos(): Unit = {
    ext.Similarity.clearCaches()
    ext.Multimodal.clearCaches()
    ext.Dedup.clearCaches()
    ext.TextOps.clearCaches()
    ml.PriceModel.clearCache()
  }

  def clearAll(): Unit = {
    clearQueryMemos()
    streaming.Streams.clearCaches()
    // machinery memo (reader-factory conf broadcasts), not a query
    // result: resident across bench sweeps like the staged-schema memo,
    // dropped here so a session crossing many corpora frees the blocks
    streaming.TxLogScan.clearConfBroadcasts()
  }
}

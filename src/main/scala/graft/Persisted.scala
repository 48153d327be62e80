package graft

import org.apache.spark.sql.DataFrame

/** Registry of operator-persisted intermediates (shingle relations, edge
  * sets, ...). Operators persist to avoid recomputing expensive branches of
  * a single query plan, but a returned lazy DataFrame gives them no point
  * to unpersist — so they register here instead, and the *caller* releases
  * everything once its results are materialized:
  *
  * {{{
  *   val out = Dedup.minhashNearDuplicates(docs, "doc_id", "text")
  *   out.write.parquet(...)     // materialize
  *   graft.Persisted.unpersistAll()   // release intermediates
  * }}}
  *
  * Verify/Bench call [[unpersistAll]] after each query; long-lived library
  * sessions should do the same (or `spark.catalog.clearCache()`), otherwise
  * cached relations accumulate for the session's lifetime.
  */
object Persisted {
  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Register an already-persisted DataFrame; returns it unchanged. */
  def track(df: DataFrame): DataFrame = { tracked.add(df); df }

  /** Unpersist every tracked DataFrame (non-blocking) and clear the list. */
  def unpersistAll(): Unit = {
    var df = tracked.poll()
    while (df != null) {
      df.unpersist(false)
      df = tracked.poll()
    }
  }
}

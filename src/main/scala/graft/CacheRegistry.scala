package graft

import org.apache.spark.sql.Dataset

/** Release handles for operator-scoped caches (r9 VERDICT ask #5).
  *
  * Several operators persist a small intermediate frame that multiple
  * branches of their OWN plan consume (`Quality.tokenDrift`'s
  * group×vocab counts, `LanguageModel`'s token frames, the rebalance
  * totals). The persist is correct — without it the corpus re-scans
  * per consumer — but the frame is consumed lazily at the CALLER's
  * action, so the operator cannot unpersist before returning. In a
  * long-lived session (a 110-query Verify/Bench run) those caches
  * would otherwise accumulate in the block manager indefinitely.
  *
  * Contract: an operator that persists an intermediate it cannot
  * release itself registers it here; whoever materializes the result
  * (Verify after each query's parquet write, Bench after each rep,
  * an application after its own action) calls [[releaseAll]].
  * Unpersist is idempotent, so double-release — e.g. an operator
  * that also releases eagerly on a path where it CAN — is safe, and
  * releasing a frame that a later, separately-built plan re-persists
  * is harmless (each builder call registers its own copy).
  *
  * Thread-safe: Verify/Bench are single-threaded over queries, but CV
  * cells and tests run builders from thread pools.
  */
object CacheRegistry {
  private val frames =
    new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Register a frame the caller has just persisted; returns it. */
  def register[T](df: Dataset[T]): Dataset[T] = { frames.add(df); df }

  /** Unpersist (non-blocking) every registered frame and forget it. */
  def releaseAll(): Unit = {
    var d = frames.poll()
    while (d != null) { d.unpersist(false); d = frames.poll() }
  }

  /** Frames registered and not yet released (for tests). */
  def pending: Int = frames.size
}

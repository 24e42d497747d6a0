package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for DataFrames the engine persists internally (e.g. the
  * shingle-hash table inside `Dedup.nearDupPairs`, the vector base in
  * `Similarity.embeddingNearDups`).
  *
  * Multi-stage operators legitimately cache intermediates they read more
  * than once, but the handle is buried inside the operator — a long-lived
  * session that invokes such operators repeatedly would accumulate cached
  * blocks forever, and a benchmark's warm-up pass would leave caches the
  * timed pass then reads. Every internal persist is routed through
  * [[persist]] so session owners (and Bench) can [[unpersistAll]] at a
  * known point.
  */
object ManagedCache {

  private val handles = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` at `level` and remember the handle. */
  def persist(
      df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val p = df.persist(level)
    handles.add(p)
    p
  }

  /** Drop every tracked cache (non-blocking). Safe to call at any time:
    * unpersisting a DataFrame that still has downstream consumers only
    * degrades them to recompute, never breaks correctness.
    */
  def unpersistAll(): Unit = {
    var df = handles.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = handles.poll()
    }
  }
}

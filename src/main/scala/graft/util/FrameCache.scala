package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ONE session-keyed DataFrame cache the operator modules share
  * (normalized/bucketed embeddings, MinHash signatures, CC fixpoints,
  * encoded multimodal payloads) — previously four hand-rolled TrieMap
  * idioms with divergent eviction discipline.
  *
  * Guarantees:
  *  - entries of STOPPED sessions are dropped on every access (a
  *    library JVM never pins dead sessions' storage);
  *  - at most `maxEntries` live entries, FIFO-evicted — a long-lived
  *    session whose input plans keep changing (the foreachBatch
  *    dedup-on-ingest loop) stays bounded instead of accreting one
  *    pinned cache entry per micro-batch;
  *  - `cache()`-backed entries are `unpersist`ed on eviction (the SQL
  *    CacheManager holds them strongly — removal alone would leak;
  *    recomputation stays correct). `localCheckpoint`-backed entries
  *    (`unpersistOnEvict = false`) are only dropped from the map:
  *    unpersisting a checkpoint makes the frame unrecoverable for any
  *    caller still holding it, and the ContextCleaner reclaims the
  *    blocks once the RDD is unreachable.
  */
object FrameCache {
  /** The canonical cache key for a derived frame: the stage name, the
    * input plan's semantic hash (WHAT is computed over WHICH plan) and
    * the [[ContentToken]] of the plan's file inputs (WHICH VERSION of
    * the data — a corpus regenerated in place at the same path must
    * miss, or the memo serves frames computed over the old bytes for
    * the rest of the session; the stale-persisted-index bug class). */
  def key(stage: String, df: DataFrame): String =
    s"$stage:${df.queryExecution.analyzed.semanticHash()}:${ContentToken.ofFrame(df)}"
}

final class FrameCache(maxEntries: Int = 32) {

  private case class Entry(df: DataFrame, unpersistOnEvict: Boolean)

  private val map =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Entry]
  private val order =
    new java.util.concurrent.ConcurrentLinkedQueue[(SparkSession, String)]

  def getOrElseUpdate(session: SparkSession, key: String,
                      unpersistOnEvict: Boolean = true)
                     (build: => DataFrame): DataFrame = {
    evictStopped()
    val k = (session, key)
    map.get(k) match {
      case Some(e) => e.df
      case None =>
        val df = build
        if (map.putIfAbsent(k, Entry(df, unpersistOnEvict)).isEmpty) {
          // drop any stale queue entry from a prior eviction of this
          // key, so a re-inserted key re-enters FIFO at the tail
          order.remove(k)
          order.add(k)
          trim()
          df
        } else
          // lost a race; the winner's frame is canonical — unless the
          // winner was ALSO concurrently evicted, in which case our
          // own (uncached) frame is still a correct answer
          map.get(k).map(_.df).getOrElse(df)
    }
  }

  private def evictStopped(): Unit =
    map.keys.foreach { case k @ (s, _) =>
      // stopped session: storage is gone with the context, no unpersist
      if (s.sparkContext.isStopped) map.remove(k)
    }

  private def trim(): Unit = {
    while (map.size > maxEntries) {
      val k = order.poll()
      if (k == null) return // queue lag behind stopped-session removals
      map.remove(k).foreach { e =>
        if (e.unpersistOnEvict)
          try e.df.unpersist(blocking = false) catch { case _: Throwable => () }
      }
    }
  }
}

package graft.util

/** A tiny bounded driver-side memo (FIFO eviction) for cheap derived
  * values — trained k-means models, PQ codebooks. Content-token keys
  * mean an in-place corpus regeneration mints a NEW key per version;
  * an unbounded map would retain every superseded value for the
  * JVM's lifetime. Values here are kilobytes, so a small cap is about
  * hygiene, not memory pressure — [[FrameCache]] is the heavyweight
  * sibling for session-pinned DataFrames. */
final class BoundedMemo[V](maxEntries: Int) {
  private val map = scala.collection.concurrent.TrieMap.empty[String, V]
  private val order = new java.util.concurrent.ConcurrentLinkedQueue[String]

  def getOrElseUpdate(key: String, build: => V): V =
    map.get(key) match {
      case Some(v) => v
      case None =>
        val v = build
        if (map.putIfAbsent(key, v).isEmpty) {
          order.remove(key)
          order.add(key)
          while (map.size > maxEntries) {
            val k = order.poll()
            if (k == null) return v
            map.remove(k)
          }
          v
        } else map.getOrElse(key, v)
    }

  def clear(): Unit = { map.clear(); order.clear() }
}

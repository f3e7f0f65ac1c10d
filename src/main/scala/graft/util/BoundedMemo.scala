package graft.util

/** A tiny bounded driver-side memo (FIFO eviction) for cheap derived
  * values — trained k-means models, PQ codebooks. Content-token keys
  * mean an in-place corpus regeneration mints a NEW key per version;
  * an unbounded map would retain every superseded value for the
  * JVM's lifetime. Values here are kilobytes, so a small cap is about
  * hygiene, not memory pressure — [[FrameCache]] is the heavyweight
  * sibling for session-pinned DataFrames.
  *
  * `getOrElseUpdate` evaluates `build` EXACTLY ONCE per key even under
  * concurrent first access (round-15, closing the ADVICE race note):
  * `computeIfAbsent` installs a cell atomically, and the cell's `lazy
  * val` runs the builder outside the map's bin lock but under the
  * cell's own init lock — so side-effecting builders (Lloyd's
  * training, the no-retrain witness) cannot run twice for one key.
  * Re-entrant use (a builder touching the SAME memo) is not
  * supported — none of the current builders do. */
final class BoundedMemo[V](maxEntries: Int) {
  private final class Cell(build: () => V) { lazy val value: V = build() }
  private val map =
    new java.util.concurrent.ConcurrentHashMap[String, Cell]
  private val order = new java.util.concurrent.ConcurrentLinkedQueue[String]

  def getOrElseUpdate(key: String, build: => V): V = {
    val cell = map.computeIfAbsent(key, k => { order.add(k); new Cell(() => build) })
    while (map.size > maxEntries) {
      val k = order.poll()
      if (k == null) return cell.value // queue drained by a racing trim
      if (k != key) map.remove(k) // never evict the entry being served
      else order.add(k) // re-queue self at the tail, evict another
    }
    cell.value
  }

  def clear(): Unit = { map.clear(); order.clear() }
}

package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-conditioned broadcast hints (round-5 verdict items 2): a
  * forced `broadcast()` bypasses Catalyst's size check, so a hint on a
  * corpus-proportional frame (PageRank's rank frame, triangle count's
  * edge set, a dedup drop-list) that is profitable at bench scale
  * becomes a driver OOM at 100 TB. [[maybeBroadcast]] applies the hint
  * only when a caller-supplied row bound says the frame fits broadcast
  * capacity; past the cap it returns the frame unhinted and join
  * selection falls back to Catalyst/AQE (which can still choose a
  * runtime broadcast from ACTUAL sizes, or the shuffled route) — the
  * same capacity tiering `Clustering.semDedup` applies past k=64.
  */
object Broadcasting {

  /** Session conf key overriding the row cap — tests set it to 0 to
    * force every tiered call down the non-broadcast route. */
  val maxRowsKey = "graft.broadcast.maxRows"

  /** Default cap: ~4M rows. The tiered frames carry tens of bytes per
    * row (a key plus a counter/rank), so the cap bounds the broadcast
    * at ~100 MB — comfortably inside executor/driver budgets (Spark's
    * own hard broadcast ceiling is 8 GB) while still covering every
    * bench-scale input; the corpus-proportional frames it guards
    * against run to hundreds of millions of rows at 100 TB. */
  val defaultMaxRows: Long = 4L << 20

  /** `broadcast(df)` iff `rowBound` (an UPPER bound on df's rows,
    * from a count the caller already paid for or a cheap metadata
    * count of a superset frame) is within capacity; otherwise `df`
    * untouched. `rowBound` is by-name so callers may pass a count
    * that is only evaluated when the conf has not disabled the tier
    * outright. */
  /** The tier predicate itself — for operators that pick a whole
    * ALGORITHM by capacity (triangle count's adjacency-intersection
    * vs wedge-shuffle paths), not just a join hint. */
  def fits(session: org.apache.spark.sql.SparkSession,
           rowBound: => Long): Boolean = {
    // a malformed override must not crash the query mid-plan; fall
    // back to the default cap (misconfiguration degrades to the
    // shipped posture, never to a failure)
    val cap = session.conf.getOption(maxRowsKey)
      .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
      .getOrElse(defaultMaxRows)
    cap > 0 && rowBound <= cap
  }

  def maybeBroadcast(df: DataFrame, rowBound: => Long): DataFrame =
    if (fits(df.sparkSession, rowBound)) broadcast(df) else df

}

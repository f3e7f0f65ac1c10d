package graft.util

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Exact global `row_number` over a total order WITHOUT the
  * single-partition window Spark plans for `Window.orderBy(...)` —
  * the one plan shape that cannot survive a corpus-sized frame,
  * because every row funnels through one task.
  *
  * The classic distributed alternative (what `RDD.zipWithIndex` does
  * internally, lifted to DataFrames and made rank-correct):
  *
  *  1. range-partition on the sort key and sort within partitions —
  *     partition i holds keys strictly before partition i+1, so the
  *     concatenation of sorted partitions IS the total order;
  *  2. one bounded counting job — ONE row per partition comes back to
  *     the driver;
  *  3. emit rank = partition offset + local position.
  *
  * The sorted frame is `localCheckpoint`ed first so the counting pass
  * and the emit pass see byte-identical partitions (range
  * partitioning samples its bounds; two independent executions could
  * otherwise disagree at partition edges).
  *
  * The caller must pass a TOTAL order (break ties — e.g. by id), or
  * equal-key rows get an arbitrary-but-stable relative order.
  */
object GlobalRank {

  /** Session conf key overriding the window-route row cap — tests set
    * it to 0 to force the range-partitioned route. */
  val windowMaxRowsKey = "graft.globalRank.windowMaxRows"

  /** Below this many rows the plain window is cheaper: the
    * single-partition sort is bounded and avoids the tiered route's
    * two extra jobs (checkpoint + partition count). The tier follows
    * the [[Broadcasting]] capacity idiom — bench-scale frames ride
    * the fast constant-overhead-free path, corpus-scale frames can
    * never funnel through one task. */
  val defaultWindowMaxRows: Long = 4L << 20

  /** Exact global row_number over `order`; `rowBound` is an upper
    * bound on df's rows the caller already paid for (both routes are
    * rank-identical, spec-pinned). */
  def withRowNumber(df: DataFrame, rankCol: String, rowBound: Long,
                    order: Column*): DataFrame = {
    require(order.nonEmpty, "global rank needs at least one sort column")
    val spark = df.sparkSession
    val cap = spark.conf.getOption(windowMaxRowsKey)
      .map(_.toLong).getOrElse(defaultWindowMaxRows)
    if (rowBound <= cap) {
      val w = org.apache.spark.sql.expressions.Window.orderBy(order: _*)
      df.withColumn(rankCol,
        org.apache.spark.sql.functions.row_number().over(w).cast("long"))
    } else rangePartitionedRowNumber(df, rankCol, order: _*)
  }

  /** The scale route: range-partition + per-partition offsets. */
  private[graft] def rangePartitionedRowNumber(df: DataFrame, rankCol: String,
                                               order: Column*): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sorted = df
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .localCheckpoint()
    val counts = sorted.rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _) // offsets(i) = rows before partition i
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = sorted.schema.add(rankCol, LongType, nullable = false)
    val ranked = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var r = bc.value(i)
      it.map { row => r += 1; Row.fromSeq(row.toSeq :+ r) }
    }
    spark.createDataFrame(ranked, schema)
  }
}

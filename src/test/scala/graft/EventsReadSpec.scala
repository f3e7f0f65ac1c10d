package graft

import graft.sources.Tables
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Tables.events must yield one stable surface — `ts: timestamp` at
  * µs precision under the UTC session zone — no matter which parquet
  * physical type the harness wrote (`TIMESTAMP(NANOS)` historically,
  * `TIMESTAMP(MICROS)` isAdjustedToUTC=false today) or which reader
  * path resolved it. Asserts the RESULT, not the conf mechanics. */
class EventsReadSpec extends AnyFunSuite with SparkSpec {
  test("events read yields µs UTC timestamps and leaves session conf untouched") {
    val key  = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.count() > 0)
    // the values are the instants the oracle (DuckDB) sees: the
    // harness generates January-2024 event times
    val (lo, hi) = {
      import org.apache.spark.sql.functions._
      val r = df.agg(min("ts").cast("string"), max("ts").cast("string")).head()
      (r.getString(0), r.getString(1))
    }
    assert(lo.startsWith("2024-"), s"min ts looks wrong: $lo")
    assert(hi.startsWith("2024-"), s"max ts looks wrong: $hi")
    // whatever reader path ran, the session conf is as it was found
    assert(spark.conf.getOption(key) == prev)
    // a later plain parquet read in the same session is unaffected
    assert(Tables.orders(spark, "/root/testdata/sf0.001").count() > 0)
  }

  test("normalizeEventTs yields the same instants from all three reader types") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // one instant with sub-µs structure: 2024-01-05 06:07:08.123456789
    val ns = 1704434828L * 1000000000L + 123456789L
    val asLong = Seq(ns).toDF("ts") // legacy nanosAsLong read: epoch ns
    val asNtz = Seq(ns / 1000).toDF("us")
      .select(timestamp_micros($"us").cast(TimestampNTZType).as("ts")) // native NTZ read
    val asTs = Seq(ns / 1000).toDF("us")
      .select(timestamp_micros($"us").as("ts")) // already-normalized read
    val got = Seq(asLong, asNtz, asTs).map { df =>
      val out = Tables.normalizeEventTs(df)
      assert(out.schema("ts").dataType == TimestampType)
      out.select(col("ts").cast("string")).head().getString(0)
    }
    assert(got.distinct == Seq("2024-01-05 06:07:08.123456"), got.toString)
  }
}

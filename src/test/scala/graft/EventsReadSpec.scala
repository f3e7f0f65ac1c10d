package graft

import graft.sources.Tables
import org.scalatest.funsuite.AnyFunSuite

/** The events table stores ts as TIMESTAMP(NANOS); Tables.events scopes
  * the legacy nanosAsLong conf to its own schema resolution and must
  * restore the session conf AND still execute correctly afterwards. */
class EventsReadSpec extends AnyFunSuite with SparkSpec {
  test("events read works with scoped nanosAsLong conf and restores it") {
    // pin a known prior state: another suite's readEventsStream may
    // have legitimately left the flag set session-wide (streams need
    // it across micro-batches); events() restores whatever it FOUND
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    // getOption yields the entry's default ("false") when unset; the
    // point is the flag is not left "true" session-wide.
    assert(!spark.conf.get("spark.sql.legacy.parquet.nanosAsLong").toBoolean)
    assert(df.count() > 0)
    // a later plain parquet read in the same session is unaffected
    assert(Tables.orders(spark, "/root/testdata/sf0.001").count() > 0)
  }
}

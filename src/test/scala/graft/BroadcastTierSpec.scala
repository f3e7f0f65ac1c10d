package graft

import graft.operators.{Dedup, Graph}
import graft.util.Broadcasting
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The capacity tier behind every formerly-unconditional
  * corpus-proportional `broadcast()` hint (round-5 verdict item 2):
  * with `graft.broadcast.maxRows = 0` every tiered call takes the
  * non-broadcast route (Catalyst/AQE pick the join strategy from
  * actual sizes), and each of the four affected queries must produce
  * the IDENTICAL result it produces with the hint. */
class BroadcastTierSpec extends AnyFunSuite with SparkSpec {

  private def withCap[A](rows: String)(f: => A): A = {
    spark.conf.set(Broadcasting.maxRowsKey, rows)
    try f finally spark.conf.unset(Broadcasting.maxRowsKey)
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq

  test("maybeBroadcast hints under the cap, not past it, never at cap 0") {
    import spark.implicits._
    val df = Seq((1, "a")).toDF("k", "v")
    def hinted(d: DataFrame): Boolean =
      d.queryExecution.logical.collectFirst {
        case h: org.apache.spark.sql.catalyst.plans.logical.UnresolvedHint => h
      }.nonEmpty
    assert(hinted(Broadcasting.maybeBroadcast(df, 10)))
    assert(!hinted(Broadcasting.maybeBroadcast(df, Long.MaxValue)))
    withCap("0") {
      // cap 0 short-circuits: the (by-name) bound is never needed
      assert(!hinted(Broadcasting.maybeBroadcast(df,
        sys.error("bound must not be evaluated at cap 0"))))
    }
    withCap("5") {
      assert(hinted(Broadcasting.maybeBroadcast(df, 5)))
      assert(!hinted(Broadcasting.maybeBroadcast(df, 6)))
    }
    // malformed override degrades to the default cap, never a crash
    withCap("not-a-number") {
      assert(hinted(Broadcasting.maybeBroadcast(df, 10)))
      assert(!hinted(Broadcasting.maybeBroadcast(df, Long.MaxValue)))
    }
  }

  test("pagerank is identical via the non-broadcast route") {
    val want = rows(Graph.pagerankActors(spark, sf))
    val got = withCap("0")(rows(Graph.pagerankActors(spark, sf)))
    assert(got == want)
  }

  test("triangle count is identical via the non-broadcast route") {
    val want = rows(Graph.triangleCount(spark, sf))
    val got = withCap("0")(rows(Graph.triangleCount(spark, sf)))
    assert(got == want)
  }

  test("ngram jaccard pairs are identical via the non-broadcast route") {
    val want = rows(Dedup.ngramJaccardPairs(spark, sf))
    val got = withCap("0")(rows(Dedup.ngramJaccardPairs(spark, sf)))
    assert(got == want && want.nonEmpty)
  }

  test("dedup apply is identical via the non-broadcast route") {
    val want = rows(Dedup.dedupApply(spark, sf))
    val got = withCap("0")(rows(Dedup.dedupApply(spark, sf)))
    assert(got == want && want.nonEmpty)
  }

  test("stream-static enrichment is identical via the non-broadcast route") {
    val want = rows(graft.streaming.EventStreams.eventsEnriched(spark, sf))
    val got = withCap("0")(
      rows(graft.streaming.EventStreams.eventsEnriched(spark, sf)))
    assert(got == want && want.nonEmpty)
  }
}

package graft

import graft.operators.{Dedup, Pipeline, TextAnalytics}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composed pipeline must agree stage-by-stage with the
  * standalone operators it chains — the reconciliation that makes
  * the end-to-end report trustworthy as an audit log. */
class PipelineSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs = graft.sources.Tables.documents(spark, sf)
  private lazy val st = Pipeline.stagesOf(docs)
  private lazy val report = Pipeline.pipeline(spark, sf).collect()
    .map(r => (r.getLong(0), r.getString(2)) -> r).toMap

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] = {
    import spark.implicits._
    df.select($"doc_id".cast("long")).as[Long].collect().toSet
  }

  test("stage accounting is monotone and stage 5 mirrors stage 4") {
    val byStage = (0L to 5L).map(s =>
      s -> report.collect { case ((st0, _), r) if st0 == s => r }.toSeq).toMap
    // survivors never increase along the chain, per language
    (0L to 3L).foreach { s =>
      val cur = byStage(s).map(r => r.getString(2) -> r.getLong(3)).toMap
      byStage(s + 1).foreach { r =>
        assert(r.getLong(3) <= cur.getOrElse(r.getString(2), 0L),
          s"stage ${s + 1} grew for lang ${r.getString(2)}")
      }
    }
    // the mix_pack row repeats stage 4's survivor accounting and
    // carries weight/bins/padding
    byStage(5L).foreach { r =>
      val s4r = report((4L, r.getString(2)))
      assert(r.getLong(3) == s4r.getLong(3) && r.getLong(4) == s4r.getLong(4))
      assert(!r.isNullAt(5) && !r.isNullAt(6) && !r.isNullAt(7))
      // padding is bounded by one partial bin per shard stream
      assert(r.getLong(7) < Pipeline.PackCtx.toLong * Pipeline.PackShards)
    }
    // weights over token counts sum to 1 (the temperature normalizer)
    val wsum = byStage(5L).map(_.getDouble(5)).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"mix weights sum to $wsum")
  }

  test("stage 1 == qualityFilter's kept counts per language") {
    import spark.implicits._
    val want = TextAnalytics.qualityFilter(spark, sf)
      .select($"lang", $"n_kept").as[(String, Long)].collect().toMap
    val got = report.collect { case ((1L, lang), r) => lang -> r.getLong(3) }
    // langs where nothing survives are absent from the report
    want.foreach { case (lang, n) =>
      assert(got.getOrElse(lang, 0L) == n,
        s"stage-1 $lang: ${got.get(lang)} vs qualityFilter $n")
    }
  }

  test("stage 2 == distinct content hashes of stage 1 (min-id survivors)") {
    import spark.implicits._
    val distinctHashes = st.s1.select(md5($"text")).distinct().count()
    assert(st.s2.count() == distinctHashes)
    // survivors are the min-id representative of their hash group
    val bad = st.s1.groupBy(md5($"text").as("h"))
      .agg(min($"doc_id").as("m"))
      .join(st.s2.select(md5($"text").as("h"), $"doc_id"), "h")
      .filter($"m" =!= $"doc_id").count()
    assert(bad == 0)
  }

  test("stage 3 drops exactly the doc_b side of the survivors' MinHash pairs") {
    import spark.implicits._
    val pairs = Dedup.minHashNearDupsOf(
      st.s2.select($"doc_id", $"text"), Pipeline.MinHashThreshold)
    val wantDrops = pairs.select($"doc_b".cast("long")).as[Long].collect().toSet
    assert(ids(st.s2) -- ids(st.s3) == wantDrops)
  }

  test("stage 4 removes the benchmark docs plus decontaminate's flags") {
    import spark.implicits._
    // decontaminate flags are a per-doc property (shares a 5-gram
    // with the bench set), so the full-corpus operator's flag set
    // restricted to stage-3 survivors IS the pipeline's contam set
    val flagged = TextAnalytics.decontaminate(spark, sf)
      .select($"doc_id".cast("long")).as[Long].collect().toSet
    val bench = ids(st.benchIds.select($"bench_id".as("doc_id")))
    val s3ids = ids(st.s3)
    assert(ids(st.contamIds) == (flagged & (s3ids -- bench)))
    assert(ids(st.s4) == s3ids -- bench -- ids(st.contamIds))
  }
}

package graft

import graft.operators.TextAnalytics
import graft.sources.Ingest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-5 additions: winnowing fingerprints, the
  * Count-Min-Sketch bound certification, and the Z-order layout's
  * actual locality (the property the bench timing rides on). */
class SketchLayoutSpec extends AnyFunSuite with SparkSpec {

  test("winnowing selects a subset of shingle hashes, ≥1 per full window") {
    import spark.implicits._
    val fp = TextAnalytics.winnowFingerprint(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(fp.nonEmpty)
    // same salt-7 hash family the operator uses
    val full = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", explode(graft.functions.TextAnalysis.shingles(
        graft.functions.TextAnalysis.tokens($"text"), 3)).as("sh"))
      .select($"doc_id", graft.functions.Hashing.md5i32($"sh", 7).as("h"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n"), min($"h").as("mn"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    fp.foreach { case (doc, nFp, fpMin, _) =>
      val (nSh, shMin) = full(doc)
      // selection: never more fingerprints than shingles, min agrees
      // (the global min hash is always a window minimum)
      assert(nFp <= nSh, s"doc $doc: $nFp fingerprints from $nSh shingles")
      assert(fpMin == shMin, s"doc $doc: winnow min $fpMin vs shingle min $shMin")
      // winnowing density: every disjoint window contributes ≤ w mins,
      // so coverage can't collapse to near-zero
      assert(nFp >= math.max(1L, (nSh - 3) / 8),
        s"doc $doc: $nFp fingerprints is implausibly sparse for $nSh shingles")
    }
  }

  test("CMS estimates certify against exact top-term counts") {
    import spark.implicits._
    val rows = TextAnalytics.heavyHittersBound(spark, sf)
      .as[(String, Long, Boolean)].collect()
    assert(rows.length == 20)
    assert(rows.forall(_._3), s"bound violated: ${rows.filterNot(_._3).toSeq}")
    val exact = TextAnalytics.topTerms(spark, sf, 20)
      .as[(String, Long)].collect().toSeq
    assert(rows.map(r => (r._1, r._2)).toSeq == exact)
  }

  test("zvalue interleaves bits: z(3, 5) = 39, monotone in each dim") {
    import spark.implicits._
    val z = Seq((3, 5)).toDF("a", "b")
      .select(Ingest.zvalue($"a", $"b").as("z")).as[Long].head()
    assert(z == 39L) // a bits → positions 0,2; b bits → 1,5: 1+2+4+32
  }

  test("z-ordered files cover small rectangles of the key plane") {
    import spark.implicits._
    val t = Ingest.zorderedLineitem(spark, sf)
      .select(input_file_name().as("f"), $"l_partkey", $"l_suppkey")
    val g = t.agg(
      (max($"l_partkey") - min($"l_partkey") + 1).cast("double").as("pw"),
      (max($"l_suppkey") - min($"l_suppkey") + 1).cast("double").as("sw"))
      .as[(Double, Double)].head()
    val globalArea = g._1 * g._2
    val perFile = t.groupBy($"f").agg(
      ((max($"l_partkey") - min($"l_partkey") + 1).cast("double") *
        (max($"l_suppkey") - min($"l_suppkey") + 1).cast("double")).as("area"))
      .agg(avg($"area"), count(lit(1))).as[(Double, Long)].head()
    val (avgArea, nFiles) = perFile
    assert(nFiles >= 8, s"expected a multi-file layout, got $nFiles")
    // a row-order layout gives every file ~the whole plane; the
    // z-layout must cut the average bounding box to a fraction of it
    assert(avgArea <= globalArea / 4.0,
      f"avg file box $avgArea%.0f vs plane $globalArea%.0f — no 2-D locality")
  }

  test("range layout: sketch splits partition the corpus into balanced, ordered buckets") {
    import spark.implicits._
    val got = Ingest.rangeLayout(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val n = graft.sources.Tables.documents(spark, sf).count()
    // the buckets PARTITION the corpus: all four present, counts sum to N
    assert(got.map(_._1) == Seq(0L, 1L, 2L, 3L))
    assert(got.map(_._2).sum == n)
    // ranges are disjoint and ordered — the property a range-
    // partitioned write needs for per-file min/max pruning
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(a._4 < b._3,
        s"bucket ${a._1} max ${a._4} overlaps bucket ${b._1} min ${b._3}")
    }
    // balance: each bucket within 25% ± 10% of N (the s=256 sample's
    // 3σ ≈ 8% quantile-rank error, plus tie discretization)
    got.foreach { case (b, c, _, _) =>
      val frac = c.toDouble / n
      assert(frac >= 0.15 && frac <= 0.35, s"bucket $b holds $frac of rows")
    }
  }
}

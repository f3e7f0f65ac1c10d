package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  test("image decode is REAL: javax.imageio round-trips exact pixel values") {
    // encode the deterministic pattern as a genuine PNG, decode it
    // back through ImageIO, and pin every pixel against the pattern
    val bytes = Multimodal.encodePng(7L, 5, 3)
    // PNG magic proves these are real encoded bytes, not a fake
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P'.toByte
      && bytes(2) == 'N'.toByte && bytes(3) == 'G'.toByte)
    val d = Multimodal.decodeOne(7L, "image", bytes, 5, 3, 1)
    assert(d.width == 5 && d.height == 3 && d.pixels.length == 15)
    for (y <- 0 until 3; x <- 0 until 5)
      assert(d.pixels(y * 5 + x) == Multimodal.patternValue(7L, x, y) / 255.0f)
    // undecodable image payloads fail loudly, never fabricate
    intercept[IllegalArgumentException] {
      Multimodal.decodeOne(9L, "image", "not a png".getBytes, 3, 2, 1)
    }
  }

  test("image decode caps pixel payloads at MaxPixels") {
    val big = Multimodal.decodeOne(8L, "image", Multimodal.encodePng(8L, 100, 100), 100, 100, 1)
    assert(big.pixels.length == Multimodal.MaxPixels)
  }

  test("audio decode is REAL: javax.sound round-trips exact PCM samples") {
    val bytes = Multimodal.encodeWav(7L, 8000, 6)
    // RIFF magic proves these are real encoded WAV bytes, not a fake
    assert(bytes(0) == 'R'.toByte && bytes(1) == 'I'.toByte
      && bytes(2) == 'F'.toByte && bytes(3) == 'F'.toByte)
    val d = Multimodal.decodeOne(7L, "audio", bytes, 3, 2, 1)
    assert(d.pixels.length == 6)
    for (i <- 0 until 6)
      assert(d.pixels(i) == Multimodal.sampleValue(7L, i) / 32768.0f)
    // undecodable audio payloads fail loudly, never fabricate
    intercept[IllegalArgumentException] {
      Multimodal.decodeOne(9L, "audio", "not a wav".getBytes, 3, 2, 1)
    }
  }

  test("video decode is REAL: framed PNGs round-trip exact per-frame pixels") {
    val bytes = Multimodal.encodeFramedPngs(5L, 4, 3, 2)
    val d = Multimodal.decodeOne(5L, "video", bytes, 4, 3, 2)
    assert(d.width == 4 && d.height == 3 && d.pixels.length == 24)
    for (f <- 0 until 2; y <- 0 until 3; x <- 0 until 4)
      assert(d.pixels(f * 12 + y * 4 + x) ==
        Multimodal.patternValue(Multimodal.frameId(5L, f), x, y) / 255.0f)
  }

  test("video decode stops reading frames at the pixel cap") {
    val bytes = Multimodal.encodeFramedPngs(6L, 64, 48, 4)
    val d = Multimodal.decodeOne(6L, "video", bytes, 64, 48, 4)
    assert(d.pixels.length == Multimodal.MaxPixels)
  }

  test("distributed encode+decode round-trips every image asset exactly") {
    import spark.implicits._
    val withPng = Multimodal.assetsWithRealPayloads(spark, sf)
    val images = withPng.filter($"kind" === "image")
    val decoded = Multimodal.decodeAssets(images.repartition(4))
    // spot-check full pixel equality on a handful of assets
    val sample = decoded.filter(_.asset_id < 30).collect()
    assert(sample.nonEmpty)
    sample.foreach { d =>
      val n = math.min(d.width * d.height, Multimodal.MaxPixels)
      assert(d.pixels.length == n)
      var i = 0
      while (i < n) {
        assert(d.pixels(i) ==
          Multimodal.patternValue(d.asset_id, i % d.width, i / d.width) / 255.0f)
        i += 1
      }
    }
    // decoded geometry equals the metadata geometry for ALL images
    val bad = decoded.toDF()
      .join(images.select($"asset_id", $"width".as("mw"), $"height".as("mh")), "asset_id")
      .filter($"width" =!= $"mw" || $"height" =!= $"mh").count()
    assert(bad == 0)
  }

  test("distributed decode preserves row count and runs per-partition") {
    val assets = Multimodal.assetsWithRealPayloads(spark, sf)
    val decoded = Multimodal.decodeAssets(assets.repartition(4))
    assert(decoded.count() == assets.count())
  }

  test("resize pools to the fixed grid") {
    import spark.implicits._
    val assets = Multimodal.assetsWithRealPayloads(spark, sf).limit(10)
    val pooled = Multimodal.resizePooled(Multimodal.decodeAssets(assets))
    val sizes = pooled.select(size($"pixels")).distinct().as[Int].collect()
    assert(sizes.toSeq == Seq(64)) // 8x8 for every asset
  }

  test("pooled integer code sums replay the decoded samples exactly (r10)") {
    import spark.implicits._
    val assets = Multimodal.assetsWithRealPayloads(spark, sf).limit(30)
    val pooled = Multimodal.resizePooledCodes(Multimodal.decodeAssets(assets))
      .as[(Long, String, Int, Seq[Long])].collect()
    assert(pooled.nonEmpty && pooled.exists(_._2 == "audio")
      && pooled.exists(_._2 != "audio"))
    val raw = Multimodal.decodeAssets(assets).collect()
      .map(d => d.asset_id -> d).toMap
    pooled.foreach { case (id, kind, nPx, sums) =>
      val d = raw(id)
      assert(nPx == d.pixels.length)
      assert(sums.length == 64)
      val scale = if (kind == "audio") 32768f else 255f
      val cell = math.max(1, nPx / 64)
      for (i <- 0 until 64) {
        val from = math.min(i * cell, nPx - 1)
        val until = math.min(from + cell, nPx)
        val want = (from until until)
          .map(j => math.round(d.pixels(j) * scale).toLong).sum
        assert(sums(i) == want, s"asset $id kind $kind cell $i")
      }
    }
  }

  test("decodeStats census: integer-exact per-kind aggregates (r10)") {
    import spark.implicits._
    val rows = Multimodal.decodeStats(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    rows.foreach { r =>
      val (kind, nAssets, nPx, pooledPx, pooledSum, avg) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(6))
      assert(nAssets > 0 && nPx >= pooledPx && pooledPx > 0)
      // avg_code must be the exact IEEE division of the two integers
      val scale = if (kind == "audio") 32768L else 255L
      assert(avg == pooledSum.toDouble / (pooledPx * scale).toDouble)
      if (kind != "audio") assert(avg > 0.0 && avg < 1.0)
      else assert(math.abs(avg) < 1.0)
    }
  }

  test("frame sampling keeps every 4th frame of video assets only") {
    import spark.implicits._
    val assets = Multimodal.assetsWithRealPayloads(spark, sf)
    val decoded = Multimodal.decodeAssets(assets)
    val frames = Multimodal.frameSample(decoded, stride = 4)
    val kinds = frames.join(assets.select($"asset_id", $"kind"), "asset_id")
      .select($"kind").distinct().as[String].collect()
    assert(kinds.toSeq == Seq("video"))
    // per video asset: ceil(n_frames / 4) sampled frames
    val bad = frames.groupBy($"asset_id").agg(count(lit(1)).as("got"))
      .join(assets.select($"asset_id", ceil($"n_frames" / 4.0).cast("long").as("want")), "asset_id")
      .filter($"got" =!= $"want").count()
    assert(bad == 0)
  }

  test("frame-sample census: code sums replay the pattern through the real codec") {
    import spark.implicits._
    val got = Multimodal.frameSampleStats(spark, sf)
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(got.nonEmpty)
    // geometry + code sums replayed from the fixture formulas for
    // every sampled frame of every video asset (independent of the
    // decode path — the oracle's logic, in Scala)
    val geo = Multimodal.assets(spark, sf)
      .filter($"kind" === "video")
      .select($"asset_id", $"width", $"height", $"n_frames")
      .as[(Long, Int, Int, Int)].collect()
      .map { case (id, w, h, nf) => id -> (w, h, nf) }.toMap
    got.foreach { case (id, f, nPx, codeSum, _) =>
      val (w, h, nf) = geo(id)
      val len = math.min(w * h * nf, Multimodal.MaxPixels)
      val flen = math.max(1, len / nf)
      assert(f % Multimodal.FrameStride == 0 && f < nf)
      assert(nPx == flen, s"asset $id frame $f: n_px $nPx != $flen")
      val want = (f * flen until f * flen + flen).map { j =>
        val k = (j % (w * h)).toInt
        Multimodal.patternValue(id * 131L + j / (w * h), k % w, k / w).toLong
      }.sum
      assert(codeSum == want, s"asset $id frame $f: code sum $codeSum != $want")
    }
    // first kept frame is always a keyframe; per-asset frame counts
    // match ceil(nf/stride)
    val byAsset = got.groupBy(_._1)
    byAsset.foreach { case (id, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.head._5, s"asset $id: first sampled frame not a keyframe")
      val nf = geo(id)._3
      assert(rows.length == (nf + Multimodal.FrameStride - 1) / Multimodal.FrameStride)
    }
  }

  test("audio fingerprint: volume-scaled re-masters hash to their originals") {
    import spark.implicits._
    val pairs = Multimodal.audioHashPairs(spark, sf)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"signature comparison regressed to all-pairs:\n$plan")
    val rows = pairs.collect()
    val nAudio = Multimodal.assetsWithRealPayloads(spark, sf)
      .filter($"kind" === "audio").count()
    val twins = rows.count(_.getBoolean(3))
    // the delta-sign encoding is amplitude-invariant: a 90%-volume
    // re-master must hash within the Hamming cap for (nearly) every clip
    assert(twins >= (nAudio * 9) / 10,
      s"recovered only $twins/$nAudio re-mastered twins")
    rows.foreach(r => assert(r.getLong(0) < r.getLong(1)))
  }

  test("phash near-dup recovers re-encoded twins through a banded equi-join") {
    import spark.implicits._
    val pairs = Multimodal.imagePhashPairs(spark, sf)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"signature comparison regressed to all-pairs:\n$plan")
    val rows = pairs.collect()
    val nImages = Multimodal.assetsWithRealPayloads(spark, sf)
      .filter($"kind" === "image").count()
    val twins = rows.count(_.getBoolean(3))
    // a +1-on-4%-of-pixels re-encode must hash within Hamming 3 of its
    // original for (nearly) every image — the detector's whole point
    assert(twins >= (nImages * 9) / 10,
      s"recovered only $twins/$nImages perturbed twins")
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs must be canonical a < b")
      assert(r.getLong(2) <= 3, "verify stage must enforce the Hamming cap")
    }
  }
}

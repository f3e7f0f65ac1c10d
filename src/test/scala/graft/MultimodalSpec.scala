package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  test("decode stub is deterministic and shape-honoring") {
    val d = Multimodal.decodeOne(7L, "image", "ab".getBytes("UTF-8"), 3, 2, 1)
    assert(d.pixels.length == 6) // w*h under the cap
    // pixel[i] = byte[i mod 2]/255 -> a,b,a,b,a,b
    val a = 'a'.toInt / 255.0f
    val b = 'b'.toInt / 255.0f
    assert(d.pixels.toSeq == Seq(a, b, a, b, a, b))
    // cap applies
    val big = Multimodal.decodeOne(8L, "image", "x".getBytes, 100, 100, 1)
    assert(big.pixels.length == Multimodal.MaxPixels)
  }

  test("distributed decode preserves row count and runs per-partition") {
    val assets = Multimodal.assets(spark, sf)
    val decoded = Multimodal.decodeAssets(assets.repartition(4))
    assert(decoded.count() == assets.count())
  }

  test("resize pools to the fixed grid") {
    import spark.implicits._
    val assets = Multimodal.assets(spark, sf).limit(10)
    val pooled = Multimodal.resizePooled(Multimodal.decodeAssets(assets))
    val sizes = pooled.select(size($"pixels")).distinct().as[Int].collect()
    assert(sizes.toSeq == Seq(64)) // 8x8 for every asset
  }

  test("frame sampling keeps every 4th frame of video assets only") {
    import spark.implicits._
    val assets = Multimodal.assets(spark, sf)
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
}

package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded multimodal asset: fixed-shape float payload plus its
  * geometry. Top-level case class so Spark derives a product encoder. */
case class DecodedAsset(asset_id: Long, kind: String,
                        width: Int, height: Int, n_frames: Int,
                        pixels: Array[Float])

/** Multimodal columns: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus decode / resize / frame-sample stages.
  *
  * The asset table is DERIVED deterministically from `documents`
  * (bytes = UTF-8 text payload, geometry from `n_chars`, kind from
  * `doc_id`) because the driver testdata ships no binary table — the
  * derivation is mirrored in the DuckDB oracle, so the metadata query
  * stays differentially checked.
  *
  * THE DECODE IS A STUB: this container has no image/audio codecs, so
  * `decodeOne` fabricates pixels deterministically from the payload
  * bytes. Everything AROUND the stub is the real 100 TB plumbing and
  * is what this module demonstrates:
  *  - binary payloads stay opaque columns until the decode stage (no
  *    accidental string conversions, no driver materialization);
  *  - decode runs via `mapPartitions` — the per-PARTITION shape a real
  *    codec needs (init the decoder once per partition, stream rows
  *    through it, bounded memory per row batch), the Scala analogue
  *    of `mapInPandas` batch decoding;
  *  - downstream resize / frame-sample are pure columnar math over
  *    the decoded arrays and stay in the distributed plan.
  */
object Multimodal {

  val MaxPixels = 4096 // decode cap: bounded memory per row

  /** `(asset_id, kind, bytes, width, height, sample_rate, n_frames)`
    * — binary payload + typed metadata, all derivations mirrored in
    * [[assetMetaSql]]. */
  def assets(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir).select(
      $"doc_id".as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        ($"doc_id" % 3 + 1).cast("int")).as("kind"),
      $"text".cast("binary").as("bytes"),
      (lit(16) + $"n_chars" % 64).cast("int").as("width"),
      (lit(16) + $"n_chars" % 48).cast("int").as("height"),
      (lit(8000) + ($"n_chars" % 3) * 4000).cast("int").as("sample_rate"),
      (lit(1) + $"n_chars" % 24).cast("int").as("n_frames"))
  }

  // ---------------------------------------------------------------
  // llm_multimodal_meta — typed-metadata accounting (oracle-checked)
  // ---------------------------------------------------------------

  def assetMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    assets(spark, sfDir)
      .groupBy($"kind")
      .agg(
        count(lit(1)).as("n_assets"),
        sum(octet_length($"bytes")).cast("long").as("total_bytes"),
        (sum($"width".cast("long") * $"height").cast("double") / count(lit(1)))
          .as("avg_pixels"),
        max($"sample_rate").cast("long").as("max_sample_rate"),
        sum($"n_frames").cast("long").as("total_frames"))
      .orderBy($"kind")
  }

  val assetMetaSql: String =
    """WITH a AS (
      |  SELECT doc_id AS asset_id,
      |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |    encode(text) AS bytes,
      |    16 + n_chars % 64 AS width,
      |    16 + n_chars % 48 AS height,
      |    8000 + (n_chars % 3) * 4000 AS sample_rate,
      |    1 + n_chars % 24 AS n_frames
      |  FROM documents)
      |SELECT kind, COUNT(*) AS n_assets,
      |  CAST(SUM(octet_length(bytes)) AS BIGINT) AS total_bytes,
      |  CAST(SUM(width * height) AS DOUBLE) / COUNT(*) AS avg_pixels,
      |  CAST(MAX(sample_rate) AS BIGINT) AS max_sample_rate,
      |  CAST(SUM(n_frames) AS BIGINT) AS total_frames
      |FROM a GROUP BY kind ORDER BY kind""".stripMargin

  // ---------------------------------------------------------------
  // decode (STUB) via mapPartitions
  // ---------------------------------------------------------------

  /** STUB standing in for a real codec: deterministic fake pixels
    * from the payload bytes (`pixel[i] = byte[i mod len] / 255`).
    * Shape honors the metadata (w×h, capped at [[MaxPixels]]). */
  private[graft] def decodeOne(assetId: Long, kind: String, bytes: Array[Byte],
                                   width: Int, height: Int, nFrames: Int): DecodedAsset = {
    val n = math.min(width * height, MaxPixels)
    // empty payloads are legal (dataQuality counts them) — decode to
    // zeros rather than dividing by a zero-length modulus
    val px =
      if (bytes.isEmpty) Array.fill(n)(0.0f)
      else Array.tabulate(n)(i => (bytes(i % bytes.length) & 0xff) / 255.0f)
    DecodedAsset(assetId, kind, width, height, nFrames, px)
  }

  /** Distributed decode: one "codec" per partition, rows streamed
    * through it — the shape a real decoder (libjpeg/ffmpeg handle,
    * model session) requires. */
  def decodeAssets(assets: DataFrame): Dataset[DecodedAsset] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .select($"asset_id", $"kind", $"bytes", $"width", $"height", $"n_frames")
      .as[(Long, String, Array[Byte], Int, Int, Int)]
      .mapPartitions { rows =>
        // real pipeline: initialize the codec ONCE here, close after
        rows.map { case (id, kind, bytes, w, h, f) =>
          decodeOne(id, kind, bytes, w, h, f)
        }
      }
  }

  /** Average-pool "resize" to a fixed grid — pure math over the
    * decoded payload, stays distributed. */
  def resizePooled(decoded: Dataset[DecodedAsset], outW: Int = 8, outH: Int = 8): DataFrame = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.map { d =>
      val n = d.pixels.length
      val cell = math.max(1, n / (outW * outH))
      val pooled = Array.tabulate(outW * outH) { i =>
        val from = math.min(i * cell, n - 1)
        val until = math.min(from + cell, n)
        var s = 0.0f
        var j = from
        while (j < until) { s += d.pixels(j); j += 1 }
        s / (until - from)
      }
      (d.asset_id, d.kind, pooled)
    }.toDF("asset_id", "kind", "pixels")
  }

  /** Frame sampling for video assets: treat the payload as n_frames
    * equal slices, keep every `stride`-th frame. */
  def frameSample(decoded: Dataset[DecodedAsset], stride: Int = 4): DataFrame = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.filter(_.kind == "video").flatMap { d =>
      val frameLen = math.max(1, d.pixels.length / d.n_frames)
      (0 until d.n_frames by stride).map { f =>
        val from = math.min(f * frameLen, d.pixels.length - 1)
        val until = math.min(from + frameLen, d.pixels.length)
        (d.asset_id, f, d.pixels.slice(from, until))
      }
    }.toDF("asset_id", "frame_idx", "frame")
  }

  // ---------------------------------------------------------------
  // llm_multimodal_decode — decode→resize stats (rows-only check:
  // the stub decode is not SQL-expressible; the spec pins its values)
  // ---------------------------------------------------------------

  def decodeStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pooled = resizePooled(decodeAssets(assets(spark, sfDir)))
    pooled
      .select($"asset_id", $"kind", aggregate($"pixels", lit(0.0d),
        (acc, x) => acc + x).as("pix_sum"), size($"pixels").as("n_px"))
      .groupBy($"kind")
      .agg(count(lit(1)).as("n_assets"),
        round(avg($"pix_sum" / $"n_px"), 4).as("avg_intensity"))
      .orderBy($"kind")
  }
}

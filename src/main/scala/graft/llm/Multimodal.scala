package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * binary columns with typed metadata, and run decode/feature-extract as a
  * partition-batched transform.
  *
  * The decode step itself is a STUB — image/audio codecs are not in this
  * container — replaced by a deterministic fake (byte-level stats). The
  * Spark-side plumbing is real and what matters at scale: binary columns
  * travel through parquet untouched, metadata is computed with codegen'd
  * expressions, and the heavy per-item work runs via `mapPartitions` so a
  * real decoder would amortize model/codec init once per partition (the
  * Scala analog of `mapInPandas` batch shape).
  */
object Multimodal {

  /** One decoded-item feature row (STUB features = byte statistics). */
  final case class ItemFeatures(
      item_id: Long, n_bytes: Int, checksum_mod: Long, first_byte: Int)

  /** Wrap a text corpus as a fake multimodal table: payload = utf-8 bytes
    * (stand-in for image bytes), plus typed metadata computed in the scan
    * stage. */
  def binarize(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("item_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        octet_length(encode(col(textCol), "UTF-8")).as("n_bytes"),
        md5(col(textCol)).as("digest"),
        lit("text/plain").as("mime")).as("meta"))

  /** One sampled frame's stub features (real pipeline: decoded/resized
    * frame tensor; here byte statistics so the oracle can verify). */
  final case class FrameFeatures(
      item_id: Long, frame_idx: Int, n_bytes: Int, checksum_mod: Long)

  /** Frame sampling over a binary payload (the video/audio "take every k-th
    * frame" shape): split the payload into fixed-size byte frames, keep
    * every `stride`-th, and feature-extract each kept frame with the same
    * partition-batched stub kernel as [[extractFeatures]]. The frame split
    * is declarative (`substring` on binary stays in the scan stage); only
    * the per-frame decode exits codegen, exactly where a real codec would. */
  def sampleFrames(binarized: DataFrame, frameSize: Int, stride: Int): DataFrame = {
    val spark = binarized.sparkSession
    import spark.implicits._
    val nFrames = greatest(
      ceil(col("meta.n_bytes").cast("double") / frameSize).cast("int"), lit(1))
    binarized
      .select(col("item_id").cast("long").as("item_id"), col("payload"), nFrames.as("nf"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("nf") - 1, lit(stride))))
      .select(col("item_id"), col("frame_idx"),
        expr(s"substring(payload, frame_idx * $frameSize + 1, $frameSize)").as("frame"))
      .as[(Long, Int, Array[Byte])]
      .mapPartitions { iter =>
        // per-partition codec init would happen here (stubbed)
        iter.map { case (id, idx, bytes) =>
          var sum = 0L
          var i = 0
          while (i < bytes.length) { sum += (bytes(i) & 0xFF); i += 1 }
          FrameFeatures(id, idx, bytes.length, sum % 9973L)
        }
      }
      .toDF()
  }

  /** One audio frame's energy row. */
  final case class AudioFrame(
      item_id: Long, frame_idx: Int, n_bytes: Int, energy: Long, silent: Boolean)

  /** Audio-pipeline analog over a binary payload: treat bytes as unsigned
    * 8-bit PCM samples centered at 128, split into fixed-size frames
    * (every frame, stride 1 — this is the VAD/silence-trim preprocessing
    * shape, not lm2's sampled-frames shape), and per frame compute the
    * EXACT integer energy Σ(b−128)² plus a silence verdict
    * energy < meanSqThreshold·n_bytes (the cross-multiplied form of
    * mean-square < threshold — no division, no floats). The frame split
    * stays declarative in the scan stage; only the per-frame sample loop
    * runs in the partition-batched kernel where a real resampler/VAD
    * model would amortize its init. Exact integers end to end, so the
    * oracle replays energy and verdict byte-for-byte. */
  def audioEnergy(binarized: DataFrame, frameSize: Int,
      meanSqThreshold: Int): DataFrame = {
    val spark = binarized.sparkSession
    import spark.implicits._
    require(frameSize > 0, s"audioEnergy: frameSize must be positive, got $frameSize")
    val nFrames = greatest(
      ceil(col("meta.n_bytes").cast("double") / frameSize).cast("int"), lit(1))
    binarized
      .select(col("item_id").cast("long").as("item_id"), col("payload"), nFrames.as("nf"))
      .withColumn("frame_idx", explode(sequence(lit(0), col("nf") - 1)))
      .select(col("item_id"), col("frame_idx"),
        expr(s"substring(payload, frame_idx * $frameSize + 1, $frameSize)").as("frame"))
      .as[(Long, Int, Array[Byte])]
      .mapPartitions { iter =>
        // per-partition codec/VAD-model init would happen here (stubbed)
        iter.map { case (id, idx, bytes) =>
          var e = 0L
          var i = 0
          while (i < bytes.length) {
            val d = (bytes(i) & 0xFF) - 128
            e += d.toLong * d
            i += 1
          }
          AudioFrame(id, idx, bytes.length, e,
            e < meanSqThreshold.toLong * bytes.length)
        }
      }
      .toDF()
  }

  /** One resized item's stub features. */
  final case class ResizedFeatures(
      item_id: Long, n_bytes_resized: Int, checksum_mod: Long)

  /** Resize analog over a binary payload (the image "resize to target
    * resolution" shape, on a 1-D byte signal): nearest-neighbor resample
    * to EXACTLY `targetBytes` samples — sample i reads byte
    * `(i * n_bytes) / targetBytes` (integer division), which downsamples
    * long payloads and repeats bytes of short ones, like nearest-neighbor
    * image scaling. Runs in the same partition-batched kernel shape as
    * [[extractFeatures]] (a real resizer would init its codec once per
    * partition); features are deterministic byte stats so the oracle can
    * replay the exact resample relationally. Empty payloads are dropped
    * (nothing to resample — a real pipeline would quarantine them). */
  def resizePayload(binarized: DataFrame, targetBytes: Int): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val spark = binarized.sparkSession
    import spark.implicits._
    binarized
      .filter(col("meta.n_bytes") > 0)
      .select(col("item_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        // per-partition resizer/codec init would happen here (stubbed)
        iter.map { case (id, bytes) =>
          val n = bytes.length
          var sum = 0L
          var i = 0
          while (i < targetBytes) {
            sum += (bytes(((i.toLong * n) / targetBytes).toInt) & 0xFF)
            i += 1
          }
          ResizedFeatures(id, targetBytes, sum % 9973L)
        }
      }
      .toDF()
  }

  /** ViT-style patch-grid token accounting: given per-item pixel dims,
    * compute the post-resize patch grid and the vision-token count — the
    * multimodal half of a token budget (every vision-language trainer
    * needs Σ image tokens before packing sequences). Semantics:
    * cap the longest side at `maxSide` preserving aspect ratio (integer
    * arithmetic: scaled = dim * maxSide DIV longest — floor, like a real
    * resizer snapping down to whole pixels), then patchify at
    * `patch`×`patch` with ceil division, +1 CLS token per item.
    *
    * Pure scan-stage column arithmetic — zero shuffles, no UDF; at 100 TB
    * this fuses into whatever scan produces the dims. Dims come from the
    * caller (a real pipeline reads them from the image header during
    * decode — here the lm4 query derives deterministic stub dims, keeping
    * the accounting arithmetic, which is the engine work, real). */
  def patchTokens(
      items: DataFrame, widthCol: String, heightCol: String,
      maxSide: Int, patch: Int): DataFrame = {
    require(maxSide > 0 && patch > 0,
      s"patchTokens: maxSide/patch must be positive, got $maxSide/$patch")
    // scaled dim = dim * maxSide DIV longest when downscaling, else dim
    // (integer DIV — exact, oracle-replayable). The short side of an
    // extreme aspect ratio can floor to 0 — clamp to 1 pixel like real
    // preprocessors clamp to one patch row/col. Patch counts are ceil
    // division: (d + patch-1) DIV patch.
    items
      .withColumn("__w", col(widthCol).cast("long"))
      .withColumn("__h", col(heightCol).cast("long"))
      .withColumn("__long", greatest(col("__w"), col("__h")))
      .withColumn("scaled_w", when(col("__long") > maxSide,
        greatest(expr(s"(__w * ${maxSide}L) DIV __long"), lit(1L)))
        .otherwise(col("__w")))
      .withColumn("scaled_h", when(col("__long") > maxSide,
        greatest(expr(s"(__h * ${maxSide}L) DIV __long"), lit(1L)))
        .otherwise(col("__h")))
      .withColumn("patches_x", expr(s"(scaled_w + ${patch - 1}L) DIV ${patch}L"))
      .withColumn("patches_y", expr(s"(scaled_h + ${patch - 1}L) DIV ${patch}L"))
      .withColumn("n_patches", col("patches_x") * col("patches_y"))
      .withColumn("vis_tokens", col("n_patches") + lit(1L))
      .drop("__w", "__h", "__long")
  }

  /** STUB decode/feature-extract: a real implementation would initialize a
    * codec/model once per partition and decode each payload; here the
    * "features" are deterministic byte statistics so the driver's oracle can
    * verify the batch plumbing end-to-end. The signature and batch shape
    * (iterator → iterator per partition) are the real contract. */
  def extractFeatures(binarized: DataFrame): DataFrame = {
    val spark = binarized.sparkSession
    import spark.implicits._
    binarized.select(col("item_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        // per-partition init would happen here (codec/model load — stubbed)
        iter.map { case (id, bytes) =>
          var sum = 0L
          var i = 0
          while (i < bytes.length) { sum += (bytes(i) & 0xFF); i += 1 }
          ItemFeatures(id, bytes.length, sum % 9973L,
            if (bytes.isEmpty) -1 else bytes(0) & 0xFF)
        }
      }
      .toDF()
  }
}

package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * binary columns with typed metadata, and run decode/feature-extract as a
  * partition-batched transform.
  *
  * The IMAGE path uses REAL codecs: `javax.imageio` ships in the JDK, so
  * [[renderPng]] encodes genuine PNG bytes and [[decodeResize]] /
  * [[decodeAHash]] decode them back before operating on PIXELS
  * (nearest-neighbor resample, average-hash). PNG grayscale is lossless,
  * so when the source pixels are a deterministic function of the row the
  * decoded values are oracle-replayable even though a real
  * encoder/decoder sits in the path. The audio/video kernels remain
  * byte-statistic stand-ins (no audio codecs in the JDK) with the real
  * batch shape: binary columns travel through parquet untouched, metadata
  * is computed with codegen'd expressions, and per-item work runs via
  * `mapPartitions` so codec/model init amortizes once per partition (the
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

  // ── real image codecs (javax.imageio) ───────────────────────────────────

  /** Executor-side ImageIO configuration: disable the DEFAULT disk cache.
    * `ImageIO.read(InputStream)` / `ImageIO.write(…, OutputStream)` wrap
    * every call in a FileCache stream — one temp-file create/write/read/
    * delete under `java.io.tmpdir` PER IMAGE. At engine scale that is
    * millions of temp-file cycles per scan, all 32 threads fighting one
    * directory's metadata lock, and the cost grows with on-disk tmp state
    * — the attributed cause of lm3's ×100 super-linearity and lm7's
    * round-over-round drift (PLANS.md r12 attribution table). Every
    * payload in this file is an in-memory byte array by construction, so
    * the memory-cached streams are strictly better. Idempotent static
    * set, called once per partition kernel (concurrent same-value writes
    * are benign). */
  private def imageIoNoDiskCache(): Unit =
    if (javax.imageio.ImageIO.getUseCache) javax.imageio.ImageIO.setUseCache(false)

  /** The deterministic test-card pixel function: 8-bit gray at (x, y) of
    * item `id`. Shared by the render kernel, the specs, and (spelled in
    * SQL) the lm3/lm6 oracles — the fixture-image contract. */
  def cardGray(id: Long, x: Int, y: Int): Int =
    ((id * 31L + x * 7L + y * 13L) % 256L).toInt

  /** Test-card dimensions for item `id` (co-prime moduli so aspect
    * ratios vary): width 24 + id%17, height 24 + id%13. */
  def cardDims(id: Long): (Int, Int) =
    ((24L + id % 17L).toInt, (24L + id % 13L).toInt)

  /** One rendered item: REAL PNG bytes + header dims. */
  final case class PngItem(item_id: Long, payload: Array[Byte], width: Int, height: Int)

  /** Render one deterministic grayscale test-card PNG per item through
    * the REAL `javax.imageio` encoder — the in-engine fixture-image
    * generator (the sandbox has no image corpus; determinism is what
    * makes the downstream decode oracle-checkable). Partition-batched:
    * the ImageIO/writer machinery initializes once per partition. */
  def renderPng(items: DataFrame, idCol: String): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { iter =>
        imageIoNoDiskCache() // or every encode pays a tmp-file round trip
        iter.map { id =>
          val (w, h) = cardDims(id)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { raster.setSample(x, y, 0, cardGray(id, x, y)); x += 1 }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          require(javax.imageio.ImageIO.write(img, "png", out),
            s"renderPng: no PNG writer available (item $id)")
          PngItem(id, out.toByteArray, w, h)
        }
      }
      .toDF()
  }

  /** Decode a PNG payload inside a partition kernel; raises loudly on
    * undecodable bytes (a real pipeline quarantines, never silently
    * skips). */
  private def decodePng(id: Long, payload: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    if (img == null) throw new IllegalArgumentException(
      s"decodePng: item $id carries bytes no installed reader can decode")
    img
  }

  /** One decoded-and-resized item: exact integer pixel features. */
  final case class ResizedImage(
      item_id: Long, width: Int, height: Int, rw: Int, rh: Int,
      pix_sum: Long, p00: Int, p_last: Int)

  /** TRUE image resample: decode the PNG payload with `javax.imageio`,
    * then nearest-neighbor resize the PIXELS to `targetW`×`targetH` —
    * resized (x, y) reads source ((x·w) DIV targetW, (y·h) DIV targetH),
    * the same floor mapping [[resizePayload]] applies to 1-D byte
    * signals, now over a real decoded raster. Features are exact
    * integers (gray sum + two corner samples), so with deterministic
    * source pixels the oracle replays the decode+resample end-to-end
    * (PNG grayscale is lossless). Partition-batched: ImageIO reader
    * machinery initializes once per partition. */
  def decodeResize(rendered: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0, s"bad target ${targetW}x$targetH")
    val spark = rendered.sparkSession
    import spark.implicits._
    rendered.select(col("item_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        imageIoNoDiskCache() // or every decode pays a tmp-file round trip
        iter.map { case (id, payload) =>
          val img = decodePng(id, payload)
          val raster = img.getRaster
          val (w, h) = (img.getWidth, img.getHeight)
          var sum = 0L
          var p00 = 0
          var pLast = 0
          var y = 0
          while (y < targetH) {
            val sy = (y.toLong * h / targetH).toInt
            var x = 0
            while (x < targetW) {
              val sx = (x.toLong * w / targetW).toInt
              val g = raster.getSample(sx, sy, 0)
              sum += g
              if (x == 0 && y == 0) p00 = g
              if (x == targetW - 1 && y == targetH - 1) pLast = g
              x += 1
            }
            y += 1
          }
          ResizedImage(id, w, h, targetW, targetH, sum, p00, pLast)
        }
      }
      .toDF()
  }

  /** One perceptual hash row: 63 usable aHash bits (bit 63 left clear so
    * the value never wraps negative in any engine). */
  final case class AHashRow(item_id: Long, phash: Long)

  /** aHash over an already-decoded raster: nearest-neighbor the raster to
    * `grid`×`grid`, set bit i = y·grid + x when cells·gray > Σgray (the
    * cross-multiplied mean compare — no division, no floats); the top bit
    * stays clear. Shared by [[decodeAHash]] (PNG/JPEG column payloads) and
    * [[jpegAHashBand]] (in-kernel round trip) so the two paths cannot
    * drift. */
  private def aHashOfRaster(
      raster: java.awt.image.Raster, w: Int, h: Int, grid: Int): Long =
    aHashOfSampler((x, y) => raster.getSample(x, y, 0), w, h, grid)

  /** THE hash kernel: nearest-neighbor-sample a `grid`×`grid` lattice from
    * any gray-pixel source and threshold against the cross-multiplied
    * mean. Every aHash in this file — decoded rasters and codec-free card
    * pixels alike — funnels through this one body, so the sampling and
    * threshold arithmetic cannot drift between paths. */
  private def aHashOfSampler(
      sample: (Int, Int) => Int, w: Int, h: Int, grid: Int): Long = {
    val cells = grid * grid
    val g = new Array[Int](cells)
    var tot = 0L
    var i = 0
    while (i < cells) {
      val sx = ((i % grid).toLong * w / grid).toInt
      val sy = ((i / grid).toLong * h / grid).toInt
      g(i) = sample(sx, sy)
      tot += g(i)
      i += 1
    }
    var hash = 0L
    i = 0
    while (i < cells && i < 63) {
      if (g(i).toLong * cells > tot) hash |= (1L << i)
      i += 1
    }
    hash
  }

  /** The EXACT aHash of item `id`'s test card, straight from the pixel
    * function — no codec in the path. This is the reference value the
    * lossless decode paths must reproduce bit-for-bit and the lossy JPEG
    * path must land within a hamming band of; the lm6/lm7 oracles spell
    * the same arithmetic in SQL. Same kernel as [[aHashOfRaster]], sampling
    * [[cardGray]] directly instead of a decoded raster. */
  def cardAHash(id: Long, grid: Int = 8): Long = {
    val (w, h) = cardDims(id)
    aHashOfSampler((x, y) => cardGray(id, x, y), w, h, grid)
  }

  /** TRUE average-hash over decoded pixels: decode the PNG, nearest-
    * neighbor the raster to `grid`×`grid`, and set bit i = y·grid + x
    * when 64·gray > Σgray (the cross-multiplied mean compare — no
    * division, no floats); the top bit stays clear. Same kernel shape as
    * [[decodeResize]]. */
  def decodeAHash(rendered: DataFrame, grid: Int = 8): DataFrame = {
    require(grid >= 2 && grid * grid <= 64, s"bad aHash grid $grid")
    val spark = rendered.sparkSession
    import spark.implicits._
    val cells = grid * grid
    rendered.select(col("item_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        imageIoNoDiskCache() // or every decode pays a tmp-file round trip
        iter.map { case (id, payload) =>
          val img = decodePng(id, payload)
          AHashRow(id,
            aHashOfRaster(img.getRaster, img.getWidth, img.getHeight, grid))
        }
      }
      .toDF()
  }

  /** One JPEG round-trip row: the codec-free exact hash, the hash of the
    * JPEG encode→decode round trip, and their hamming distance. */
  final case class JpegBandRow(
      item_id: Long, phash_exact: Long, phash_jpeg: Long, hamming: Int)

  /** JPEG (LOSSY) encode→decode→aHash round trip, banded against the exact
    * hash. PNG is lossless, so lm3/lm6 can demand bit-equality; a real
    * 100 TB multimodal corpus is mostly JPEG, where decoded pixels are NOT
    * bit-reproducible across codec builds — the contract a lossy path can
    * honestly certify is a BOUNDED perceptual-hash deviation, not
    * equality. Per item, in ONE partition-batched kernel (encoder/decoder
    * machinery initializes once per partition, nothing but the 3-column
    * verdict ever shuffles): render the deterministic test card, compute
    * its exact aHash straight from the raster, push the raster through a
    * REAL `javax.imageio` JPEG writer at `quality`, decode the bytes back,
    * hash the decoded raster with the SAME [[aHashOfRaster]] kernel, and
    * emit both hashes plus their hamming distance. Callers threshold the
    * hamming (the lm7 oracle pins the witness TRUE on a band far below
    * the ~31.5-bit expectation of unrelated hashes, with headroom for
    * codec-build variation). */
  def jpegAHashBand(items: DataFrame, idCol: String, grid: Int = 8,
      quality: Float = 0.95f): DataFrame = {
    require(grid >= 2 && grid * grid <= 64, s"bad aHash grid $grid")
    require(quality > 0f && quality <= 1f, s"bad JPEG quality $quality")
    val spark = items.sparkSession
    import spark.implicits._
    items.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { iter =>
        // REAL codec machinery, once per partition: the writer is reused
        // across rows (the mapInPandas batch-amortization shape); readers
        // come from ImageIO's cached registry.
        imageIoNoDiskCache() // or every decode pays a tmp-file round trip
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("jpg").next()
        val params = writer.getDefaultWriteParam
        params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        params.setCompressionQuality(quality)
        iter.map { id =>
          val (w, h) = cardDims(id)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { raster.setSample(x, y, 0, cardGray(id, x, y)); x += 1 }
            y += 1
          }
          val exact = aHashOfRaster(raster, w, h, grid)
          val out = new java.io.ByteArrayOutputStream()
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
          writer.setOutput(ios)
          writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
          ios.close()
          val bytes = out.toByteArray
          val back = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          if (back == null) throw new IllegalStateException(
            s"jpegAHashBand: item $id round-tripped to undecodable JPEG bytes")
          val lossy = aHashOfRaster(
            back.getRaster, back.getWidth, back.getHeight, grid)
          JpegBandRow(id, exact, lossy,
            java.lang.Long.bitCount(exact ^ lossy))
        }
      }
      .toDF()
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

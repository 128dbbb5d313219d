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

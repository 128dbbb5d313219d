package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.Similarity

/** Frozen-index streaming vector ingest: stream assignment equals the
  * batch kernel against the same frozen centroids (and cross-pins to
  * Similarity.centroidAssign on the train corpus itself); per-cell
  * occupancy state survives a checkpoint restart and matches the batch
  * rollup. */
class VectorStreamSpec extends SparkSpec {

  import spark.implicits._

  private val ProvKey = "spark.sql.streaming.stateStore.providerClass"

  private def withRocksDb[T](body: => T): T = {
    val old = spark.conf.getOption(ProvKey)
    spark.conf.set(ProvKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally old match {
      case Some(v) => spark.conf.set(ProvKey, v)
      case None => spark.conf.unset(ProvKey)
    }
  }

  private def train() = graft.Td.table(spark, Sf0001, "embeddings")

  private def asDrop(df: org.apache.spark.sql.DataFrame) =
    df.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))

  test("streamed frozen-centroid assignment equals the batch kernel and centroidAssign") {
    val dir = Files.createTempDirectory("vecstream1").toString
    val t = train()
    // two drops: first/second half of the corpus by id parity
    asDrop(t.filter(col("vec_id") % 2 === 0)).coalesce(1)
      .write.mode("append").json(s"$dir/landing")
    asDrop(t.filter(col("vec_id") % 2 === 1)).coalesce(1)
      .write.mode("append").json(s"$dir/landing")
    val q = VectorStream.startAssign(spark, s"$dir/landing", t, s"$dir/out", s"$dir/ckpt")
    q.awaitTermination()
    val streamed = spark.read.parquet(s"$dir/out/assign")
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap

    val cents = VectorStream.frozenCentroids(t, "label", "embedding")
    val batch = VectorStream.assign(t, "vec_id", "embedding", cents)
      .collect().map(a => a.vec_id -> a.cell).toMap
    assert(streamed == batch && streamed.nonEmpty)

    // cross-pin: assigning the TRAIN corpus against its own centroids is
    // exactly centroidAssign's prediction
    val ca = Similarity.centroidAssign(t, "vec_id", "label", "embedding")
      .select("vec_id", "label_pred").as[(Long, Int)].collect().toMap
    assert(batch == ca)
  }

  test("per-cell occupancy survives a checkpoint restart and matches the batch rollup") { withRocksDb {
    val dir = Files.createTempDirectory("vecstream2").toString
    val t = train()
    val seen = scala.collection.mutable.Set.empty[String]
    val t0 = System.currentTimeMillis() - 600000L
    // run 1: even ids
    asDrop(t.filter(col("vec_id") % 2 === 0)).coalesce(1)
      .write.mode("append").json(s"$dir/landing")
    stampDrop(s"$dir/landing", seen, t0)
    VectorStream.start(spark, s"$dir/landing", t, s"$dir/out", s"$dir/ckpt")
      .awaitTermination()
    // run 2, same checkpoint: odd ids — counts must CONTINUE, not reset
    asDrop(t.filter(col("vec_id") % 2 === 1)).coalesce(1)
      .write.mode("append").json(s"$dir/landing")
    stampDrop(s"$dir/landing", seen, t0 + 60000L)
    VectorStream.start(spark, s"$dir/landing", t, s"$dir/out", s"$dir/ckpt")
      .awaitTermination()

    import org.apache.spark.sql.expressions.Window
    val latest = spark.read.parquet(s"$dir/out/cells")
      .withColumn("__rn", row_number().over(
        Window.partitionBy("cell").orderBy(col("batch_id").desc)))
      .filter(col("__rn") === 1)
      .select("cell", "n_total").as[(Int, Long)].collect().toMap

    val cents = VectorStream.frozenCentroids(t, "label", "embedding")
    val batch = VectorStream.assign(t, "vec_id", "embedding", cents)
      .groupBy("cell").count().as[(Int, Long)].collect().toMap
    assert(latest == batch && latest.values.sum == t.count())
  } }
}

package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-document keyword extraction by tf-idf, with the idf reduced to
  * exact integers so both engines rank identically: idf(w) =
  * floor(log2 N) - floor(log2 df(w)) computed as `length(bin(n))`
  * differences (the same transcendental-free log2 as
  * [[Surprisal]]), score = tf × idf. Corpus-wide tokens (df = N) score
  * 0; rare-but-repeated tokens dominate — the labeling/routing signal
  * curation pipelines attach to documents (cluster naming, topic
  * routing, retrieval filters).
  *
  * Plan shape: tokens explode once into docTf (doc-scoped key, never
  * viral, partial agg absorbs token skew); docTf feeds three consumers
  * (df table, corpus doc count, scoring join) so it is [[Caches]]-
  * persisted like [[Surprisal]]'s docBg; df joins back broadcast-when-
  * small; the top-k election is a window over the doc key — never hot.
  * The doc count enters as a 1-row cross-joined aggregate (kept in-plan;
  * no driver round-trip).
  *
  * Output: doc_id, token, tf, score, rank (1..k by score desc, token
  * asc). Documents with no tokens emit no row. */
object Keywords {

  def tfidfKeywords(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val docTf = Caches.persist(docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf")))
    val df = docTf.groupBy("token").agg(count(lit(1)).cast("long").as("df"))
    val nd = docTf.agg(count_distinct(col("doc_id")).as("n"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("token"))
    docTf
      .join(df, "token")
      .crossJoin(broadcast(nd))
      .withColumn("score",
        (col("tf") * (length(bin(col("n"))) - length(bin(col("df"))))).cast("long"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("doc_id", "token", "tf", "score", "rank")
  }
}

package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextOpsSpec extends SparkSpec {

  import spark.implicits._

  test("tokens splits on whitespace runs and drops empties") {
    val got = Seq("  the  quick\tfox ").toDF("t")
      .select(TextOps.tokens(col("t"))).as[Seq[String]].head()
    assert(got == Seq("the", "quick", "fox"))
  }

  test("bpeishTokens separates punctuation into its own tokens") {
    val got = Seq("hello, world! ok").toDF("t")
      .select(TextOps.bpeishTokens(col("t"))).as[Seq[String]].head()
    assert(got == Seq("hello", ",", "world", "!", "ok"))
  }

  test("shingles: 3-gram windows, distinct, short-doc degenerates to whole doc") {
    val got = Seq("a b c d").toDF("t")
      .select(TextOps.shingles(TextOps.tokens(col("t")), 3)).as[Seq[String]].head()
    assert(got == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(TextOps.shingles(TextOps.tokens(col("t")), 3)).as[Seq[String]].head()
    assert(short == Seq("a b"))
  }

  test("fingerprint is whitespace/case insensitive") {
    val fps = Seq("The  Quick Fox", "the quick fox", "the quick  fox ")
      .toDF("t").select(TextOps.fingerprint(col("t"))).as[String].collect()
    assert(fps.distinct.length == 1)
  }

  test("langId picks the language with most stopword hits; en wins ties") {
    val cases = Seq(
      "the cat is on the mat" -> "en",
      "el gato de la casa y que" -> "es",
      "le chat et les chiens des rues" -> "fr",
      "der hund und die katze ist ein" -> "de",
      "xyzzy plugh foobar" -> "en") // no hits anywhere -> tie -> first list
    val got = cases.map(_._1).toDF("t")
      .select(TextOps.langId(TextOps.tokens(col("t")))).as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("sliding windows match the naive position-slice reference on random inputs") {
    // regression guard for the shifted-zip builder: same output as the
    // spec'd shape (positions 1..max(len-(n-1),1), windows of up to n
    // tokens) on random corpora incl. empty and shorter-than-n docs
    val rnd = new scala.util.Random(42)
    val cases = ((0 until 60).map { _ =>
      val len = rnd.nextInt(12)
      (0 until len).map(_ => s"t${rnd.nextInt(6)}").mkString(" ")
    } :+ "" :+ "single").zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = cases.toDF("id", "text")
    for (n <- 2 to 4) {
      val got = df
        .select(col("id"), TextOps.ngramsAll(TextOps.tokens(col("text")), n).as("g"))
        .as[(Long, Seq[String])].collect().toMap
      cases.foreach { case (i, t) =>
        val toks = t.split("\\s+").filter(_.nonEmpty).toSeq
        val expected = (1 to math.max(toks.length - (n - 1), 1))
          .map(p => toks.slice(p - 1, p - 1 + n).mkString(" "))
        assert(got(i) == expected, s"n=$n text='$t'")
      }
    }
  }

  test("repetitionRatio: 0 for all-unique bigrams, high for degenerate text") {
    val df = Seq(
      (1L, "a b c d e f"),           // all bigrams unique
      (2L, "spam spam spam spam spam") // one bigram repeated 4x
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextOps.repetitionRatio(TextOps.tokens(col("text")), 2).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) == 0.0)
    assert(got(2L) == 0.75) // 4 windows, 1 distinct
  }

  test("qualityScore is in [0,1] over the sf0.001 corpus") {
    val q = graft.Td.table(spark, Sf0001, "documents")
      .select(TextOps.qualityScore(TextOps.tokens(col("text")), col("text")))
      .as[Double].collect()
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
  }
}

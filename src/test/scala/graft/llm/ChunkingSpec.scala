package graft.llm

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("ragChunks: overlapping windows with a short tail, exact offsets") {
    val docs = Seq((5L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val got = Chunking.ragChunks(docs, "doc_id", "text", 4, 3)
      .select("chunk_idx", "start_tok", "n_toks", "chunk_text")
      .as[(Int, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0, 0L, 4L, "t1 t2 t3 t4"),
      (1, 3L, 4L, "t4 t5 t6 t7"),
      (2, 6L, 4L, "t7 t8 t9 t10"),
      (3, 9L, 1L, "t10")))
  }

  test("ragChunks: doc shorter than one window emits a single short chunk; empty doc none") {
    val docs = Seq((1L, "a b"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val got = Chunking.ragChunks(docs, "doc_id", "text", 8, 8)
      .select("doc_id", "n_toks", "chunk_text").as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 2L, "a b")))
  }

  test("ragChunks: stride = winSize degenerates to non-overlapping chunking") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val texts = Chunking.ragChunks(docs, "doc_id", "text", 2, 2)
      .orderBy("chunk_idx").select("chunk_text").as[String].collect().toSeq
    assert(texts == Seq("a b", "c d", "e"))
  }
}

package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetractSpec extends SparkSpec {
  import spark.implicits._

  test("deleting the current minimum surfaces the next one; counted duplicates survive partially") {
    // key A holds values {1, 1, 5}; delete ONE 1 and insert a 7
    val hist = Seq(("A", 1L, 2L), ("A", 5L, 1L)).toDF("k", "v", "cnt")
    val delta = Seq(("A", 1L, -1L), ("A", 7L, 1L)).toDF("k", "v", "dcnt")
    val got = Retract.aggFromHistogram(
        Retract.maintainHistogram(hist, delta, Seq("k")), Seq("k"))
      .as[(String, Long, Long, Long, Long)].head()
    // surviving multiset {1, 5, 7}: the duplicate 1 keeps the min at 1
    assert(got == (("A", 3L, 13L, 1L, 7L)))
    // now delete the LAST 1: min must surface 5 — the non-invertible case
    val delta2 = Seq(("A", 1L, -2L)).toDF("k", "v", "dcnt")
    val got2 = Retract.aggFromHistogram(
        Retract.maintainHistogram(hist, delta2, Seq("k")), Seq("k"))
      .as[(String, Long, Long, Long, Long)].head()
    assert(got2 == (("A", 1L, 5L, 5L, 5L)))
  }

  test("a fully-retracted key vanishes instead of lingering with zeros") {
    val hist = Seq(("A", 3L, 1L), ("B", 4L, 1L)).toDF("k", "v", "cnt")
    val delta = Seq(("A", 3L, -1L)).toDF("k", "v", "dcnt")
    val keys = Retract.aggFromHistogram(
        Retract.maintainHistogram(hist, delta, Seq("k")), Seq("k"))
      .select("k").as[String].collect().toSet
    assert(keys == Set("B"))
  }

  test("retracting a row the histogram never held raises loudly") {
    val hist = Seq(("A", 3L, 1L)).toDF("k", "v", "cnt")
    val delta = Seq(("A", 99L, -1L)).toDF("k", "v", "dcnt")
    val e = intercept[Exception] {
      Retract.maintainHistogram(hist, delta, Seq("k")).collect()
    }
    assert(e.getMessage.contains("never held")
      || Option(e.getCause).exists(_.getMessage.contains("never held")))
  }
}

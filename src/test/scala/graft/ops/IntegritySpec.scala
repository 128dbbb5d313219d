package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IntegritySpec extends SparkSpec {
  import spark.implicits._

  test("fkAudit: planted orphans counted exactly, per edge, in one child scan") {
    // child rows: 10 total; FK a -> parentA missing for ids 8, 9 (2 orphans);
    // FK b -> parentB missing for id 9 only; one NULL b (id 0) is NOT an orphan
    val child = (0L to 9L).map { i =>
      (i, if (i >= 8) 100L + i else i % 4, if (i == 0) None else Some(if (i == 9) 999L else i % 3))
    }.toDF("id", "a", "b")
    val parentA = (0L to 3L).toDF("pa")
    val parentB = (0L to 2L).toDF("pb")
    val got = Integrity.fkAudit(child, Seq(
        ("a", parentA, "pa", "child->A"),
        ("b", parentB, "pb", "child->B")))
      .select("fk", "n_rows", "n_orphans", "orphan_ppm", "pass")
      .as[(String, Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got("child->A") == (("child->A", 10L, 2L, 200000L, false)))
    assert(got("child->B") == (("child->B", 10L, 1L, 100000L, false)))
  }

  test("fkAudit: consistent data passes everywhere; duplicate parent keys never multiply") {
    val child = (0L to 99L).map(i => (i, i % 5)).toDF("id", "a")
    // parent carries each key TWICE: the key-set dedup must keep n_rows at 100
    val parentA = ((0L to 4L) ++ (0L to 4L)).toDF("pa")
    val got = Integrity.fkAudit(child, Seq(("a", parentA, "pa", "child->A")))
      .select("n_rows", "n_orphans", "pass").as[(Long, Long, Boolean)].head()
    assert(got == ((100L, 0L, true)))
  }

  test("fkAudit: an EMPTY child table reports a trivially-passing edge, not a div-by-zero") {
    val child = Seq.empty[(Long, Long)].toDF("id", "a")
    val parentA = (0L to 3L).toDF("pa")
    val got = Integrity.fkAudit(child, Seq(("a", parentA, "pa", "child->A")))
      .select("n_rows", "n_orphans", "orphan_ppm", "pass")
      .as[(Long, Long, Long, Boolean)].head()
    assert(got == ((0L, 0L, 0L, true)))
  }
}

package graft.ops

import graft.SparkSpec

class SkylineSpec extends SparkSpec {

  import spark.implicits._

  private def brute(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, tx, ty) =>
        tx >= x && ty >= y && (tx > x || ty > y)
      }
    }.toSet

  test("frontier2d matches brute-force dominance on a hash-random cloud") {
    // deterministic pseudo-random points, including duplicates
    val pts = (1L to 500L).map { i =>
      val h = i * 2654435761L
      (i, math.abs(h % 1000L), math.abs((h >> 16) % 1000L))
    }
    val got = Skyline.frontier2d(pts.toDF("id", "x", "y"), "id", "x", "y")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute(pts))
  }

  test("duplicate optimal points all stay; dominated ties drop") {
    val pts = Seq(
      (1L, 10L, 10L), (2L, 10L, 10L), // duplicate optimum — both kept
      (3L, 10L, 5L),                  // same x, lower y — dominated
      (4L, 5L, 12L),                  // frontier (higher y)
      (5L, 5L, 12L),                  // its duplicate
      (6L, 4L, 12L))                  // dominated by 4/5
    val got = Skyline.frontier2d(pts.toDF("id", "x", "y"), "id", "x", "y")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 10L), (2L, 10L, 10L), (4L, 5L, 12L), (5L, 5L, 12L)))
  }

  test("anti-correlated staircase keeps every step (worst-case frontier)") {
    val pts = (1L to 50L).map(i => (i, i, 51L - i))
    val got = Skyline.frontier2d(pts.toDF("id", "x", "y"), "id", "x", "y")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == pts.toSet)
  }

  test("degenerate one-bucket distribution raises loudly instead of going quadratic") {
    // identical x everywhere: the prefilter cannot prune, every row
    // survives, and the guard must fire rather than broadcast the corpus
    val pts = (1L to 100L).map(i => (i, 7L, i))
    val e = intercept[IllegalArgumentException] {
      Skyline.frontier2d(pts.toDF("id", "x", "y"), "id", "x", "y",
        maxSurvivors = 10L).collect()
    }
    assert(e.getMessage.contains("maxSurvivors"))
  }
}

package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PcaSpec extends SparkSpec {

  import spark.implicits._

  private def mkEmb(rows: Seq[(Long, Array[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("topComponent finds a planted dominant direction") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 200L).map { id =>
      val v = Array.fill(8)(rnd.nextFloat() * 0.02f - 0.01f)
      v(3) = (if (id % 2 == 0) 1.0f else -1.0f) * (0.5f + rnd.nextFloat() * 0.5f)
      (id, v)
    }
    val v = Pca.topComponent(mkEmb(rows), "vec_id", "embedding", dims = 8)
    Caches.release()
    assert(math.abs(v(3)) >= 990, s"component ${v.mkString(",")}")
    assert(v.zipWithIndex.filter(_._2 != 3).forall(c => math.abs(c._1) < 200))
  }

  test("topComponent is deterministic and sign-pinned") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 100L).map(id => (id, Array.fill(8)(rnd.nextFloat() - 0.5f)))
    val a = Pca.topComponent(mkEmb(rows), "vec_id", "embedding", dims = 8)
    Caches.release()
    val b = Pca.topComponent(mkEmb(rows), "vec_id", "embedding", dims = 8)
    Caches.release()
    assert(a.toSeq == b.toSeq)
    assert(a.find(_ != 0L).forall(_ > 0), "first nonzero must be positive")
  }

  test("topComponent aligns with double-precision power iteration") {
    val rnd = new scala.util.Random(23)
    val d = 8
    val rows = (0L until 300L).map { id =>
      val base = rnd.nextGaussian()
      // correlated structure: dims share a latent factor with varying loads
      (id, Array.tabulate(d)(i =>
        (base * (1.0 + i * 0.2) + rnd.nextGaussian() * 0.3).toFloat * 0.1f))
    }
    val v = Pca.topComponent(mkEmb(rows), "vec_id", "embedding", dims = d)
    Caches.release()
    // reference: double-precision power iteration on the exact covariance
    val q = rows.map(_._2.map(x => math.round(x * 1000.0).toDouble))
    val n = q.size.toDouble
    val mu = Array.tabulate(d)(i => q.map(_(i)).sum / n)
    val c = Array.tabulate(d, d)((i, j) =>
      q.map(r => (r(i) - mu(i)) * (r(j) - mu(j))).sum)
    var w = Array.fill(d)(1.0)
    for (_ <- 1 to 100) {
      val nw = Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * w(j)).sum)
      val nrm = math.sqrt(nw.map(x => x * x).sum)
      w = nw.map(_ / nrm)
    }
    val vn = math.sqrt(v.map(x => x.toDouble * x).sum)
    val cos = math.abs((0 until d).map(i => v(i) * w(i)).sum / vn)
    assert(cos > 0.99, s"cos=$cos engine=${v.mkString(",")} ref=${w.mkString(",")}")
  }

  test("projectTop emits the exact integer dot with the component") {
    val rows = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(-1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.5f, 0.25f, 0.0f, 0.0f)))
    val emb = mkEmb(rows)
    val v = Pca.topComponent(emb, "vec_id", "embedding", dims = 4)
    Caches.release()
    val proj = Pca.projectTop(emb, "vec_id", "embedding", dims = 4)
      .as[(Long, Long)].collect().toMap
    Caches.release()
    rows.foreach { case (id, e) =>
      val expected = e.zipWithIndex.map { case (x, i) =>
        math.round(x * 1000.0) * v(i)
      }.sum
      assert(proj(id) == expected, s"id=$id")
    }
    // variance lives on dim 0 here, so projections order by the first dim
    assert(math.abs(proj(0L)) > math.abs(proj(2L)))
  }
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Td

class RelationalOpsSpec extends SparkSpec {

  import spark.implicits._

  test("approx_count_distinct stays within 2% of exact per group (sf0.001)") {
    val li = Td.table(spark, Sf0001, "lineitem")
    val approx = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("a"))
      .as[(String, Long)].collect().toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("e"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      val err = math.abs(approx(k) - e).toDouble / e
      assert(err <= 0.02, s"group $k: approx ${approx(k)} vs exact $e (err $err)")
    }
  }

  test("rollup emits leaf, subtotal, and grand-total rows") {
    val df = Seq(("r1", "n1", 1), ("r1", "n2", 2), ("r2", "n3", 4)).toDF("r", "n", "v")
    val got = df.rollup("r", "n").agg(sum("v").as("s"))
      .as[(Option[String], Option[String], Long)].collect().toSet
    assert(got.contains((Some("r1"), Some("n1"), 1L)))
    assert(got.contains((Some("r1"), None, 3L)))   // region subtotal
    assert(got.contains((None, None, 7L)))         // grand total
    assert(got.size == 6)
  }
}

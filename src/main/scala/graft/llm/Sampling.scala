package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data mixing. Both use the
  * cross-engine md5 hash ([[Dedup.md5Hash60]]) as the randomness source, so
  * the same rows are kept on any engine, any cluster size, any run — the
  * property that makes dataset mixes reproducible and auditable.
  *
  * Scale shape: [[mixtureSample]] is a pure scan-stage filter (no shuffle at
  * all); [[quotaSample]] is one window shuffle on the stratum key.
  */
object Sampling {

  private def keepHash(idCol: Column, strataCol: Column): Column =
    pmod(Dedup.md5Hash60(concat_ws(":", strataCol, idCol)), lit(1000L))

  /** Mixture (per-stratum Bernoulli) sampling: keep each row of stratum s
    * with probability `rates(s)` (or `defaultRate`), decided by hashing
    * (stratum, id) into 1000 buckets. Rates are in [0, 1] with 1/1000
    * granularity. The standard "x% of web, all of books" dataset-mixing
    * primitive; a filter, so it fuses into the scan stage. */
  def mixtureSample(
      df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(keepHash(col(idCol), col(strataCol)) < round(rate * 1000).cast("long"))
  }

  /** Quota sampling: up to `quota` rows per stratum, chosen by hash order
    * (id tie-break) — deterministic balanced subsets (e.g. "200 eval docs
    * per language") without a global sort. */
  def quotaSample(
      df: DataFrame, idCol: String, strataCol: String, quota: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(keepHash(col(idCol), col(strataCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= quota)
      .drop("__rn")
  }

  /** TOKEN-budget sampling: pretraining mixes are specified in tokens, not
    * documents ("50 B tokens of web, 5 B of code"), so the quota must be a
    * running token sum, not a row count. Per stratum, documents are taken
    * in hash order (id tie-break — same deterministic, engine-independent
    * order as [[quotaSample]]) while the RUNNING total of `weightCol`
    * before the document stays under its stratum's budget
    * (`budgets(s)`, or `defaultBudget`) — so the budget may be exceeded by
    * at most one document (the standard take-while-under contract; taking
    * only strictly-fitting docs would bias against long documents near the
    * boundary). One window shuffle on the stratum key, like quotaSample;
    * the running sum rides the same sort. */
  def tokenBudgetSample(
      df: DataFrame, idCol: String, strataCol: String, weightCol: String,
      budgets: Map[String, Long], defaultBudget: Long): DataFrame = {
    val budget = budgets.foldLeft(lit(defaultBudget)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    val w = Window.partitionBy(col(strataCol))
      .orderBy(keepHash(col(idCol), col(strataCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(weightCol)).over(w))
      .filter(col("__cum") - col(weightCol) < budget)
      .drop("__cum")
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity audit: per declared FK edge, how many child rows
  * point at a parent key that does not exist (orphans). The data-quality
  * gate a warehouse runs after every load — at 100 TB nobody re-checks
  * constraints inline, they audit them as a query.
  *
  * Scale shape: ONE scan of each child table, with every one of its FK
  * edges LEFT-joined in the same pass and all orphan counters folded into
  * a single aggregate — auditing lineitem's three FKs costs one lineitem
  * scan, not three. Parent sides join as deduplicated key sets (PK
  * projection — tiny for dims and broadcast by Catalyst; a huge parent
  * falls back to a shuffle join AQE handles). NULL child keys are NOT
  * orphans here — nullability is a completeness check (dq1), not a
  * referential one; SQL FK semantics likewise skip NULLs.
  */
object Integrity {

  /** Audit every FK edge of one child table in a single scan.
    * `edges`: (childCol, parentTable, parentKeyCol, label). Output one row
    * per edge: (fk, n_rows, n_orphans, orphan_ppm, pass). */
  def fkAudit(child: DataFrame, edges: Seq[(String, DataFrame, String, String)]): DataFrame = {
    require(edges.nonEmpty, "fkAudit: no FK edges declared")
    val joined = edges.zipWithIndex.foldLeft(child) { case (df, ((ck, parent, pk, _), i)) =>
      df.join(parent.select(col(pk).as(s"__pk$i")).distinct(),
        col(ck) === col(s"__pk$i"), "left")
    }
    val orphanAggs = edges.zipWithIndex.map { case ((ck, _, _, _), i) =>
      // coalesce: sum over an EMPTY child is NULL, not 0
      coalesce(
        sum(when(col(ck).isNotNull && col(s"__pk$i").isNull, 1L).otherwise(0L)),
        lit(0L)).as(s"__orph$i")
    }
    val m = joined.agg(count(lit(1)).as("__n"), orphanAggs: _*)
    val stackExpr = edges.indices
      .map(i => s"'${edges(i)._4}', __n, __orph$i")
      .mkString(s"stack(${edges.size}, ", ", ", ") AS (fk, n_rows, n_orphans)")
    m.select(expr(stackExpr))
      // greatest(n_rows, 1): an empty child is a trivially-passing edge,
      // not an ANSI division-by-zero error
      .withColumn("orphan_ppm", expr("n_orphans * 1000000 DIV greatest(n_rows, 1)"))
      .withColumn("pass", col("n_orphans") === 0L)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared window idioms. */
object WindowOps {

  /** Keep exactly the first row per partition under `order` — the
    * keep-one-winner pattern used by exact dedup (first id per content
    * hash), as-of right-side dedup (highest tiebreak per (key, ts)),
    * and upsert version resolution (highest version per key). One
    * definition so tie handling and the temp-column convention cannot
    * drift between them. Plans as `row_number ≤ 1`, which Catalyst
    * pushes map-side as a Partial WindowGroupLimit before the
    * exchange. */
  def keepTopRow(df: DataFrame, partitionCols: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partitionCols: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff / change-data-capture between two versions of a keyed
  * table: emit one (key, op) row per insert / update / delete.
  *
  * Scale shape: neither snapshot's WIDE rows cross the shuffle — each
  * side projects to (key, xxhash64 of the non-key columns) first, so
  * the full-outer join ships two narrow (key, 8-byte hash) streams,
  * co-partitioned on the key. Unchanged keys (the overwhelming bulk of
  * a 100 TB snapshot pair) are dropped by the post-join filter before
  * anything else happens; [[changedRows]] then fetches the wide rows
  * for exactly the changed keys with a semi-join. With table formats
  * that version files (Iceberg), file-level diffing would skip
  * identical files before this row-level pass — this operator is the
  * row-exact core that that optimization feeds.
  *
  * The hash compare treats NULL and absent uniformly via a struct hash
  * over the non-key columns in a FIXED (sorted) order, so column order
  * differences between snapshots don't produce phantom updates.
  */
object TableDiff {

  private def rowHash(df: DataFrame, keys: Seq[String]) = {
    val nonKey = df.columns.filterNot(keys.contains).sorted.map(col)
    xxhash64(struct(nonKey.toIndexedSeq: _*))
  }

  /** (key…, op) for every differing key; op ∈ {insert, update, delete}
    * describing the transition old → new. Equal rows emit nothing. */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    val o = oldDf.select(keys.map(col) :+ rowHash(oldDf, keys).as("__h_old"): _*)
    val n = newDf.select(keys.map(col) :+ rowHash(newDf, keys).as("__h_new"): _*)
    o.join(n, keys, "full_outer")
      .withColumn("op",
        when(col("__h_old").isNull, lit("insert"))
          .when(col("__h_new").isNull, lit("delete"))
          .when(col("__h_old") =!= col("__h_new"), lit("update")))
      .where(col("op").isNotNull)
      .select(keys.map(col) :+ col("op"): _*)
  }

  /** The new-snapshot wide rows for changed keys only (inserts +
    * updates) — the payload a downstream consumer applies. Semi-join:
    * the (usually small) diff key set broadcasts against the snapshot.
    */
  def changedRows(newDf: DataFrame, d: DataFrame, keys: Seq[String]): DataFrame =
    newDf.join(d.where(col("op") =!= "delete").select(keys.map(col): _*),
      keys, "left_semi")
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD-1 merge (upsert): rows from `updates` replace same-key rows in
  * `base`; new keys append; untouched base rows pass through. The
  * maintenance primitive of every checkpointed corpus table (document
  * patches, metadata corrections, re-crawls).
  *
  * Scale shape: anti-join + union, NOT a full-outer join — the
  * full-outer form shuffles and coalesces EVERY column of both sides,
  * while the anti-join ships only the update KEYS against the base
  * (broadcast when the update batch is small, the overwhelmingly common
  * case: a daily patch vs a 100 TB base) and the union is a zero-cost
  * plan concatenation. With Iceberg the same operation is MERGE INTO,
  * where file-level pruning skips base files containing no updated key;
  * the declarative shape here is what that pushes down to.
  *
  * `updates` must be key-unique (one winner per key) — the CALLER
  * enforces this (run a versioned batch through [[latestPerKey]]
  * first); a duplicate-key update batch would produce duplicate rows,
  * and checking it here would cost an extra aggregation over every
  * merge. UpsertSpec documents the contract.
  */
object Upsert {

  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    require(base.columns.sorted.sameElements(updates.columns.sorted),
      s"schema mismatch: ${base.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    base.join(updates.select(col(key)), Seq(key), "left_anti")
      .unionByName(updates)
  }

  /** Deterministic key-uniqueness guard for update batches assembled
    * from at-least-once sources: keep the row with the highest
    * `version` per key (ties broken arbitrarily but deterministically
    * by the remaining columns' order is NOT assumed — supply a real
    * version column). */
  def latestPerKey(updates: DataFrame, key: String, version: String): DataFrame =
    WindowOps.keepTopRow(updates, Seq(col(key)), Seq(col(version).desc))
}

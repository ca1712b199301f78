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

  /** SCD type-2 merge: full-history dimension maintenance. `dim` rows
    * carry (key, attrs…, valid_from, valid_to, is_current) — one open
    * (`valid_to` null, `is_current` true) row per key plus closed
    * history. An update whose tracked attrs differ from the key's open
    * row CLOSES it (valid_to = update ts) and opens a new version; an
    * identical update is a no-op; a new key opens its first version.
    * History rows pass through untouched.
    *
    * Scale shape: ONE broadcast join of the update batch (a daily
    * patch) against the CURRENT slice classifies open rows AND yields
    * the changed-opens; new keys come from an anti-join that ships
    * only the narrow key column. The history bulk is a plan
    * passthrough; partition the table by `is_current` and only the
    * current partition is ever rewritten (the same write-amplification
    * argument as [[upsert]], with Iceberg MERGE as the scale target).
    *
    * Contract: `updates` key-unique ([[latestPerKey]]) and `tsCol`
    * later than affected rows' valid_from — the CALLER's batch
    * ordering guarantees, not re-checked per merge. */
  def scd2Merge(dim: DataFrame, updates: DataFrame, key: String,
                attrs: Seq[String], tsCol: String): DataFrame = {
    val current = dim.where(col("is_current"))
    val history = dim.where(!col("is_current"))
    val u = updates.select(col(key) +: attrs.map(col) :+ col(tsCol): _*)

    def differs(left: String => org.apache.spark.sql.Column,
                right: String => org.apache.spark.sql.Column) =
      attrs.map(a => not(left(a) <=> right(a))).reduce(_ || _)

    // classify each open row against its (possibly absent) update
    val cj = current.alias("c")
      .join(broadcast(u.alias("u")), col(s"c.$key") === col(s"u.$key"), "left")
    val closedByUpdate = col(s"u.$key").isNotNull &&
      differs(a => col(s"c.$a"), a => col(s"u.$a"))
    val mappedCurrent = cj.select(
      (col(s"c.$key").as(key) +:
        attrs.map(a => col(s"c.$a").as(a)) :+
        col("c.valid_from").as("valid_from") :+
        when(closedByUpdate, col(s"u.$tsCol")).otherwise(col("c.valid_to"))
          .as("valid_to") :+
        (!closedByUpdate).as("is_current")): _*)

    // updates that open a new version: changed attrs (read off the SAME
    // broadcast join — no second pass over current) or brand-new keys
    // (anti-join against current KEYS only — at scale the narrow key
    // column ships, never the dim rows)
    def openRow(side: String, from: org.apache.spark.sql.DataFrame) = from.select(
      (col(s"$side.$key").as(key) +:
        attrs.map(a => col(s"$side.$a").as(a)) :+
        col(s"$side.$tsCol").as("valid_from") :+
        lit(null).cast(dim.schema("valid_to").dataType).as("valid_to") :+
        lit(true).as("is_current")): _*)
    val openedFromChanged = openRow("u", cj.where(closedByUpdate))
    val openedNewKeys = openRow("u",
      u.alias("u").join(current.select(col(key)), Seq(key), "left_anti"))

    history.select(mappedCurrent.columns.map(col): _*)
      .unionByName(mappedCurrent)
      .unionByName(openedFromChanged)
      .unionByName(openedNewKeys)
  }

  /** Deterministic key-uniqueness guard for update batches assembled
    * from at-least-once sources: keep the row with the highest
    * `version` per key (ties broken arbitrarily but deterministically
    * by the remaining columns' order is NOT assumed — supply a real
    * version column). */
  def latestPerKey(updates: DataFrame, key: String, version: String): DataFrame =
    WindowOps.keepTopRow(updates, Seq(col(key)), Seq(col(version).desc))
}

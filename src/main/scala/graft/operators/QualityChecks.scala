package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the admission gate every
  * training-data pipeline runs before a table version is published.
  *
  * Scale shape: all row-level constraints (completeness, bounds, set
  * membership, format) evaluate in ONE scan — each check is a pair of
  * aggregate expressions folded into a single `agg(...)`, so a 100 TB
  * table is read once for the whole suite, map-side-combined, with one
  * O(#checks)-row result. The naive one-query-per-check loop reads the
  * table #checks times. Multi-column uniqueness and referential
  * integrity genuinely need a shuffle (distinct / anti-join) and are
  * separate methods — callers see exactly which checks are scan-cheap
  * and which are not.
  *
  * Every metric is a deterministic exact aggregate (no sampling), so
  * the DuckDB oracle replays the whole suite from the base table.
  */
object QualityChecks {

  /** One row-level constraint: `metric` is an aggregate expression over
    * the scanned rows; `pass` is a predicate over that metric value. */
  final case class Check(name: String, metric: Column, pass: Column => Column)

  /** Completeness: fraction of non-null values in `c`. */
  def completeness(name: String, c: Column): Check =
    Check(name,
      avg(when(c.isNotNull, 1.0d).otherwise(0.0d)),
      m => m >= 1.0d)

  /** Bounds: fraction of rows where `pred` holds (nulls fail). */
  def satisfies(name: String, pred: Column, minFraction: Double = 1.0d): Check =
    Check(name,
      avg(when(coalesce(pred, lit(false)), 1.0d).otherwise(0.0d)),
      m => m >= minFraction)

  /** Run row-level checks in one aggregation pass. Output: one row per
    * check — (check, metric rounded to 6dp, pass). */
  def runRowChecks(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val aggs = checks.map(c => round(c.metric, 6).as(c.name))
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single wide row into (check, metric, pass) — plan is
    // still the one scan + one final projection
    val rows = checks.map { c =>
      struct(lit(c.name).as("check_name"), col(c.name).as("metric"),
        c.pass(col(c.name)).as("pass"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Uniqueness of a (possibly composite) key: distinct keys / rows.
    * Needs the distinct shuffle — kept out of the single-pass suite. */
  def uniqueness(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val key = keyCols.map(col)
    df.agg(
        countDistinct(key.head, key.tail: _*).cast("double").as("d"),
        count(lit(1)).cast("double").as("n"))
      .select(
        lit("unique_" + keyCols.mkString("_")).as("check_name"),
        round(col("d") / col("n"), 6).as("metric"),
        (col("d") === col("n")).as("pass"))
  }

  /** Referential integrity: fraction of child rows whose `childKey`
    * exists in `parent.parentKey`. Anti-join counts the orphans — the
    * parent side broadcasts when small (the usual dim case). */
  def referentialIntegrity(child: DataFrame, childKey: String,
                           parent: DataFrame, parentKey: String): DataFrame = {
    val orphans = child.join(parent.select(col(parentKey)),
      col(childKey) === col(parentKey), "left_anti")
    child.agg(count(lit(1)).cast("double").as("n"))
      .crossJoin(orphans.agg(count(lit(1)).cast("double").as("o")))
      .select(
        lit(s"ri_${childKey}_in_$parentKey").as("check_name"),
        round((col("n") - col("o")) / col("n"), 6).as("metric"),
        (col("o") === 0.0d).as("pass"))
  }
}

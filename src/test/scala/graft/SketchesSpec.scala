package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private def events = spark.read.parquet(s"$dir/events.parquet")

  test("HLL merge invariance: per-shard sketches unioned == one direct sketch, for ANY sharding") {
    val direct = Sketches.hllDirectEstimate(events, Seq("event_type"), "event_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // two completely different shardings must both merge back to the
    // direct estimate EXACTLY (HLL union is register-wise max —
    // order- and partition-independent)
    for (shard <- Seq(to_date(col("ts")), pmod(col("event_id"), lit(7)))) {
      val merged = Sketches.hllMergeEstimate(
          Sketches.hllPartials(events, Seq("event_type"), shard, "event_id"),
          Seq("event_type"))
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(merged == direct, s"sharded-merge estimate diverged for $shard")
    }
  }

  test("HLL merge is incremental: adding one shard's sketch re-merges without re-scanning old shards") {
    val withDay = events.withColumn("d", dayofmonth(col("ts")))
    val oldShards = Sketches.hllPartials(withDay.where(col("d") =!= 1),
      Seq("event_type"), col("d"), "event_id")
    val newShard = Sketches.hllPartials(withDay.where(col("d") === 1),
      Seq("event_type"), col("d"), "event_id")
    // the persisted-sketch-table pattern: union of (old partials ∪ the
    // one new partial) — no old rows touched
    val incr = Sketches.hllMergeEstimate(oldShards.union(newShard), Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val direct = Sketches.hllDirectEstimate(events, Seq("event_type"), "event_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(incr == direct)
  }

  test("approx_count_distinct stays within its error bound against exact") {
    val rows = Sketches.approxDistinctChecked(events, Seq("event_type"),
      "event_id", rsd = 0.05, relErrBound = 0.15).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("within")),
      rows.map(r => s"${r.get(0)}: est=${r.get(1)} exact=${r.get(2)}").mkString("; "))
  }

  test("approx quantiles: every estimate is a real element with rank within the GK guarantee") {
    val rows = Sketches.approxQuantilesChecked(events, Seq("event_type"),
      "value", Seq(0.25, 0.5, 0.75), accuracy = 1000).collect()
    assert(rows.length == 15) // 5 types × 3 ps
    assert(rows.forall(_.getAs[Boolean]("rank_ok")),
      rows.filterNot(_.getAs[Boolean]("rank_ok")).mkString("; "))
    // percentile_approx returns actual data values, not interpolations
    val values = events.select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(rows.forall(r =>
      values.contains((r.getString(0), r.getAs[Double]("est")))))
  }

  test("sketch aggregation plans are single-pass with map-side partials (no distinct expand)") {
    import org.apache.spark.sql.execution.FormattedMode
    val s = Sketches.hllDirectEstimate(events, Seq("event_type"), "event_id")
      .queryExecution.explainString(FormattedMode)
    // one exchange (the group-by); a naive exact countDistinct plans an
    // extra distinct-expand exchange of every (group, value) pair
    assert(s.linesIterator.count(_.matches(".*\\bExchange \\(\\d+\\).*")) == 1, s)
    assert(s.contains("partial_hll_sketch_agg"),
      "map-side partial sketch aggregation lost")
  }
}

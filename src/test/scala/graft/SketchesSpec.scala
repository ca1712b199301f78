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

  test("count-min estimates never underestimate and respect the eps·N bound") {
    val cands = events.select(col("user_id")).distinct()
    val rows = Sketches.cmsChecked(events, "user_id", cands,
      eps = 0.005, confidence = 0.99, seed = 42).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("no_underestimate")),
      "CMS underestimated a frequency — impossible by construction")
    assert(rows.forall(_.getAs[Boolean]("bound_ok")))
  }

  test("count-min sketches are exactly mergeable: sum of per-shard sketches == one-pass sketch") {
    import org.apache.spark.util.sketch.CountMinSketch
    def readCms(b: Array[Byte]) = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b))
    val lo = Sketches.cmsBuild(events.where(col("event_id") % 2 === 0),
      "user_id", 0.005, 0.99, 42)
    val hi = Sketches.cmsBuild(events.where(col("event_id") % 2 =!= 0),
      "user_id", 0.005, 0.99, 42)
    val full = readCms(Sketches.cmsBuild(events, "user_id", 0.005, 0.99, 42))
    val merged = readCms(lo)
    merged.mergeInPlace(readCms(hi))
    import spark.implicits._
    val keys = events.select(col("user_id")).distinct().as[Long].collect()
    keys.foreach { k =>
      assert(merged.estimateCount(java.lang.Long.valueOf(k)) ==
        full.estimateCount(java.lang.Long.valueOf(k)),
        s"merge changed the estimate for key $k")
    }
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

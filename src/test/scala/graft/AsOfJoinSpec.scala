package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(sec: Long): java.sql.Timestamp = new java.sql.Timestamp(sec * 1000L)

  test("asOf picks the most recent at-or-before right row per key") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(100), 1L),  // before any right row → null payload
      (1L, ts(200), 2L),  // exactly at right@200 → inclusive match
      (1L, ts(250), 3L),  // between 200 and 300 → right@200
      (1L, ts(300), 4L),  // at 300 → right@300
      (1L, ts(999), 5L),  // far after → still right@300 (most recent)
      (2L, ts(250), 6L),  // other key: its own timeline
      (3L, ts(250), 7L))  // key with no right rows at all
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts(200), 10L, 2.0),
      (1L, ts(300), 11L, 3.0),
      (2L, ts(240), 20L, 24.0))
      .toDF("user_id", "ts", "rid", "value")

    val out = AsOfJoin.asOf(left, right, "user_id", "ts",
        Map("rid" -> "ref_rid", "value" -> "ref_value"))
      .select($"event_id", $"ref_rid", $"ref_value")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    assert(out(1L) == ((None, None)))
    assert(out(2L) == ((Some(10L), Some(2.0))))
    assert(out(3L) == ((Some(10L), Some(2.0))))
    assert(out(4L) == ((Some(11L), Some(3.0))))
    assert(out(5L) == ((Some(11L), Some(3.0))))
    assert(out(6L) == ((Some(20L), Some(24.0))))
    assert(out(7L) == ((None, None)))
    // left-outer: every left row survives exactly once
    assert(out.size == 7)
  }

  test("a NULL payload field of the matched right row stays null — no torn rows") {
    import spark.implicits._
    val left = Seq((1L, ts(300), 1L)).toDF("user_id", "ts", "event_id")
    // most recent right row has value=NULL; an older row has value=5.0 —
    // per-column carry would fabricate (rid=11, value=5.0), a row that
    // never existed (and DuckDB's ASOF JOIN would disagree)
    val right = Seq(
      (1L, ts(100), 10L, Option(5.0)),
      (1L, ts(200), 11L, Option.empty[Double]))
      .toDF("user_id", "ts", "rid", "value")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts",
        Map("rid" -> "ref_rid", "value" -> "ref_value"))
      .select($"ref_rid", $"ref_value")
      .as[(Option[Long], Option[Double])].collect().toSeq
    assert(out == Seq((Some(11L), None)), s"torn row: $out")
  }

  test("a payload output name colliding with a left column fails fast") {
    import spark.implicits._
    val left = Seq((1L, ts(300), 1L)).toDF("user_id", "ts", "event_id")
    val right = Seq((1L, ts(100), 10L)).toDF("user_id", "ts", "rid")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right, "user_id", "ts", Map("rid" -> "event_id"))
    }
    assert(e.getMessage.contains("collide with left columns"))
  }

  test("latestPerKeyTs resolves same-timestamp right rows deterministically") {
    import spark.implicits._
    val right = Seq(
      (1L, ts(200), 10L, 1.0),
      (1L, ts(200), 12L, 9.0),  // same (key, ts): highest rid wins
      (1L, ts(200), 11L, 5.0))
      .toDF("user_id", "ts", "rid", "value")
    val dedup = AsOfJoin.latestPerKeyTs(right, "user_id", "ts", "rid")
    assert(dedup.count() == 1)
    assert(dedup.select($"rid").as[Long].head() == 12L)
  }

  test("asOf is a single exchange — union + one window, no join operator") {
    import org.apache.spark.sql.execution.FormattedMode
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val left = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val right = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("rid"), col("value"))
    val plan = AsOfJoin.asOf(left, right, "user_id", "ts",
        Map("rid" -> "ref_rid", "value" -> "ref_value"))
      .queryExecution.explainString(FormattedMode)
    assert(plan.linesIterator.count(_.matches(".*\\bExchange \\(\\d+\\)")) == 1,
      s"as-of join must cost exactly one shuffle\n$plan")
    assert(!plan.contains("Join"), s"as-of must not plan a join operator\n$plan")
  }

  test("q_asof_join matches a per-row reference computation") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val got = RelQueries.queries("q_asof_join")(spark, dir)
      .select($"event_id", $"ref_event_id").as[(Long, Long)].collect().toMap
    // independent in-memory reference: linear scan per click
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select($"user_id".as[Long], $"ts".as[java.sql.Timestamp],
        $"event_id".as[Long], $"event_type".as[String]).collect()
    val purchases = ev.filter(_._4 == "purchase")
    val clicks = ev.filter(_._4 == "click")
    clicks.foreach { case (u, t, id, _) =>
      val cands = purchases.filter(p => p._1 == u && !p._2.after(t))
      val want =
        if (cands.isEmpty) -1L
        else cands.maxBy(p => (p._2.getTime, p._3))._3
      assert(got(id) == want, s"click $id: got ${got(id)}, want $want")
    }
    assert(got.size == clicks.length)
  }
}

package graft

import graft.operators.AsOfJoin
import graft.streaming.StreamingJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(sec: Long): java.sql.Timestamp = new java.sql.Timestamp(sec * 1000L)

  test("stream-stream interval join equals the batch twin, boundaries inclusive") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val win = 600L // 10-min conversion window for the test streams

    // (user_id, ts, event_id); covers: exact-boundary match (lag == win),
    // just-outside (win + 1 → no match), lag 0 (same timestamp), multiple
    // clicks per view, cross-user isolation, click with no prior view
    val views = Seq(
      (1L, ts(1000), 10L),
      (1L, ts(2000), 11L),
      (2L, ts(1000), 20L),
      (3L, ts(5000), 30L))
    val clicks = Seq(
      (1L, ts(1000), 100L),        // lag 0 vs view 10
      (1L, ts(1600), 101L),        // lag 600 == win vs view 10 (inclusive)
      (1L, ts(1601), 102L),        // lag 601 vs view 10: out; not vs 11 (before it)
      (1L, ts(2500), 103L),        // lag 500 vs view 11
      (2L, ts(1700), 200L),        // out of window for user 2's view
      (4L, ts(1000), 400L))        // user with no views

    val srcV = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val srcC = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val joined = StreamingJoin.intervalJoinStream(
      srcV.toDF().toDF("user_id", "ts", "event_id"),
      srcC.toDF().toDF("user_id", "ts", "event_id"), win)
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ss_join").start()
    try {
      // feed out of lockstep: views first, then clicks in two batches —
      // matches must emerge regardless of arrival interleaving
      srcV.addData(views: _*)
      q.processAllAvailable()
      srcC.addData(clicks.take(3): _*)
      q.processAllAvailable()
      srcC.addData(clicks.drop(3): _*)
      q.processAllAvailable()

      val streamed = spark.table("ss_join")
        .select($"user_id", $"view_id", $"click_id", $"lag_sec")
        .as[(Long, Long, Long, Long)].collect().toSet

      val batch = AsOfJoin.intervalJoin(
          views.toDF("user_id", "ts", "event_id"),
          clicks.toDF("user_id", "ts", "event_id"), "user_id", "ts", win)
        .select($"a_user_id", $"a_event_id", $"b_event_id",
          (unix_timestamp($"b_ts") - unix_timestamp($"a_ts")).as("lag"))
        .as[(Long, Long, Long, Long)].collect().toSet

      assert(streamed == batch)
      // spot-check the semantics directly, not just twin equality
      assert(streamed == Set(
        (1L, 10L, 100L, 0L),   // lag 0
        (1L, 10L, 101L, 600L), // inclusive upper bound
        (1L, 11L, 103L, 500L)))
      // exactly-once append: no duplicate emissions across batches
      assert(spark.table("ss_join").count() == streamed.size)
    } finally q.stop()
  }

  test("stream-static broadcast join enriches the stream; unmatched keys stay null") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // the third join mode of the streaming layer (next to batch-twin and
    // stream-stream): a small static dimension broadcast into every
    // micro-batch — no stream-side shuffle, no state at all
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "segment")
    val src = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val joined = src.toDF().toDF("user_id", "ts", "event_id")
      .join(broadcast(dim), Seq("user_id"), "left")
      .select($"event_id", $"segment")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ss_static").start()
    try {
      src.addData((1L, ts(100), 10L), (2L, ts(200), 20L), (7L, ts(300), 70L))
      q.processAllAvailable()
      val got = spark.table("ss_static")
        .as[(Long, Option[String])].collect().toSet
      assert(got == Set((10L, Some("gold")), (20L, Some("silver")), (70L, None)))
      // stateless: the broadcast join keeps NO streaming state
      assert(q.recentProgress.flatMap(_.stateOperators).isEmpty
        || q.recentProgress.flatMap(_.stateOperators).map(_.numRowsTotal).sum == 0)
    } finally q.stop()
  }

  test("watermark bounds stream-stream join state (old side evicted)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val win = 600L
    val srcV = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val srcC = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val joined = StreamingJoin.intervalJoinStream(
      srcV.toDF().toDF("user_id", "ts", "event_id"),
      srcC.toDF().toDF("user_id", "ts", "event_id"), win, "10 seconds")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ss_join_wm").start()
    try {
      // advance BOTH watermarks far past view@1000's eviction horizon
      // (1000 + win + 10 s); a matching-in-time click arriving later is
      // late behind the watermark and must NOT join the evicted view
      srcV.addData((1L, ts(1000), 10L), (9L, ts(100000), 90L))
      srcC.addData((9L, ts(100000), 900L))
      q.processAllAvailable()
      srcV.addData((9L, ts(200000), 91L))
      srcC.addData((9L, ts(200000), 901L))
      q.processAllAvailable()
      // eviction must be visible in the STATE METRICS, not inferred from
      // output absence (a late row is dropped before the state lookup,
      // so output alone can't distinguish eviction from unbounded state)
      val removed = q.recentProgress.flatMap(_.stateOperators).map(_.numRowsRemoved).sum
      assert(removed > 0, "watermark advanced past rows but join state evicted nothing")
      val stateRows = q.recentProgress.reverse.flatMap(_.stateOperators)
        .headOption.map(_.numRowsTotal).getOrElse(Long.MaxValue)
      assert(stateRows < 7, s"join state holds $stateRows rows — not bounded by the watermark")
      val before = spark.table("ss_join_wm").count()
      srcC.addData((1L, ts(1100), 100L)) // would match view 10 if state kept
      q.processAllAvailable()
      val rows = spark.table("ss_join_wm")
        .select($"view_id", $"click_id").as[(Long, Long)].collect().toSet
      assert(!rows.contains((10L, 100L)), s"late click joined evicted state: $rows")
      assert(spark.table("ss_join_wm").count() == before)
    } finally q.stop()
  }
}

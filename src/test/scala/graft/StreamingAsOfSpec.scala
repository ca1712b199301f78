package graft

import graft.operators.AsOfJoin
import graft.streaming.StreamingAsOf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingAsOfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(sec: Long): java.sql.Timestamp = new java.sql.Timestamp(sec * 1000L)

  test("streaming as-of equals the batch twin under out-of-order cross-batch arrival") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val srcL = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val srcR = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val out = StreamingAsOf.asOfStream(
      srcL.toDF().toDF("user_id", "ts", "event_id"),
      srcR.toDF().toDF("user_id", "ts", "rid", "value"), "60 seconds")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("asof_stream").start()
    try {
      // batch 1: a right and a LATER left — the left is not final yet
      // (watermark 150-60=90 has not passed it)
      srcR.addData((1L, ts(100), 10L, 1.0))
      srcL.addData((1L, ts(150), 1L))
      q.processAllAvailable()
      assert(spark.table("asof_stream").count() == 0,
        "left emitted before the watermark finalized it")

      // batch 2: a LATE right at 140 — it arrives AFTER left@150 did,
      // but sits before it in event time, so it must win that match
      // (the naive latest-value approach gets this wrong). Plus an
      // out-of-order left@130 and a sentinel advancing the watermark
      // to 400-60=340, finalizing both lefts.
      srcR.addData((1L, ts(140), 11L, 2.0), (9L, ts(400), 90L, 9.0))
      srcL.addData((1L, ts(130), 2L))
      q.processAllAvailable()
      // watermark updates between batches; one more nudge flushes
      srcR.addData((9L, ts(401), 91L, 9.1))
      q.processAllAvailable()

      val got1 = spark.table("asof_stream")
        .select($"event_id", $"ref_rid", $"ref_value")
        .as[(Long, Long, Double)].collect().toSet
      assert(got1 == Set((2L, 10L, 1.0), (1L, 11L, 2.0)), s"got $got1")

      // batch 3: a left far in the future — every older right was
      // evicted except the STANDING latest (rid 11), which must match
      srcL.addData((1L, ts(1000), 3L))
      srcR.addData((9L, ts(2000), 92L, 9.2))
      q.processAllAvailable()
      srcR.addData((9L, ts(2001), 93L, 9.3))
      q.processAllAvailable()

      val streamed = spark.table("asof_stream")
        .select($"event_id", $"sec", $"ref_sec", $"ref_rid", $"ref_value")
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      assert(streamed.map(_._1) == Set(1L, 2L, 3L))
      assert(streamed.contains((3L, 1000L, 140L, 11L, 2.0)))

      // full equality with the batch operator on the same rows
      val left = Seq((1L, ts(150), 1L), (1L, ts(130), 2L), (1L, ts(1000), 3L))
        .toDF("user_id", "ts", "event_id")
      val right = Seq((1L, ts(100), 10L, 1.0), (1L, ts(140), 11L, 2.0),
        (9L, ts(400), 90L, 9.0), (9L, ts(401), 91L, 9.1),
        (9L, ts(2000), 92L, 9.2), (9L, ts(2001), 93L, 9.3))
        .toDF("user_id", "ts", "rid", "value")
      val batch = AsOfJoin.asOf(left,
          right.withColumn("r_sec", unix_timestamp(col("ts"))),
          "user_id", "ts", Map("r_sec" -> "ref_sec", "rid" -> "ref_rid", "value" -> "ref_value"))
        .select($"event_id", unix_timestamp($"ts").as("sec"),
          coalesce($"ref_sec", lit(-1L)), coalesce($"ref_rid", lit(-1L)),
          coalesce($"ref_value", lit(-1.0)))
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      assert(streamed == batch, s"stream $streamed != batch $batch")
    } finally q.stop()
  }

  test("sub-second timestamps match exactly (no millisecond/second truncation)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def tsMs(ms: Long): java.sql.Timestamp = new java.sql.Timestamp(ms)
    val srcL = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val srcR = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val out = StreamingAsOf.asOfStream(
      srcL.toDF().toDF("user_id", "ts", "event_id"),
      srcR.toDF().toDF("user_id", "ts", "rid", "value"), "1 seconds")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("asof_subsec").start()
    try {
      // left at 150.5 s; watermark advances to 150.1 s — a second- or
      // millisecond-truncating implementation finalizes the left NOW
      // (150 < 150.1) and emits a wrong no-match
      srcL.addData((1L, tsMs(150500), 1L))
      q.processAllAvailable()
      srcR.addData((9L, tsMs(151100), 90L, 9.0))
      q.processAllAvailable()
      srcR.addData((9L, tsMs(151101), 91L, 9.1))
      q.processAllAvailable()
      assert(spark.table("asof_subsec").count() == 0,
        "left@150.5s finalized by a watermark at 150.1s — sub-second truncation")

      // rights at 150.2 s (before the left, must win) and 150.9 s
      // (after the left, must NOT match it), then flush
      srcR.addData((1L, tsMs(150200), 10L, 1.0), (1L, tsMs(150900), 11L, 2.0))
      q.processAllAvailable()
      srcR.addData((9L, tsMs(300000), 92L, 9.2))
      q.processAllAvailable()
      srcR.addData((9L, tsMs(300001), 93L, 9.3))
      q.processAllAvailable()
      val got = spark.table("asof_subsec")
        .select($"event_id", $"ref_rid", $"ref_value")
        .as[(Long, Long, Double)].collect().toSeq
      assert(got == Seq((1L, 10L, 1.0)), s"sub-second match wrong: $got")
    } finally q.stop()
  }

  test("randomized stream/batch as-of differential over 3 seeds (fractional seconds, shuffled arrival)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def tsMs(ms: Long): java.sql.Timestamp = new java.sql.Timestamp(ms)
    val B = 1000000000L // base ms
    for (seed <- Seq(7L, 19L, 42L)) {
      val rnd = new scala.util.Random(seed)
      // fractional-second timestamps; delay exceeds the whole span so a
      // fully SHUFFLED arrival order is still inside the watermark
      val rights = (0 until 30).map(i =>
        (rnd.nextInt(4).toLong + 1, B + rnd.nextInt(5000000), 100L + i, (100 + i) * 0.5))
      val lefts = (0 until 30).map(i =>
        (rnd.nextInt(4).toLong + 1, B + rnd.nextInt(5000000), i.toLong))
      val srcL = MemoryStream[(Long, java.sql.Timestamp, Long)]
      val srcR = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
      val sink = s"asof_rand_$seed"
      val q = StreamingAsOf.asOfStream(
        srcL.toDF().toDF("user_id", "ts", "event_id"),
        srcR.toDF().toDF("user_id", "ts", "rid", "value"), "10000 seconds")
        .toDF().writeStream.outputMode("append").format("memory")
        .queryName(sink).start()
      try {
        val shufL = rnd.shuffle(lefts).grouped(8).toSeq
        val shufR = rnd.shuffle(rights).grouped(8).toSeq
        shufL.zipAll(shufR, Nil, Nil).foreach { case (lc, rc) =>
          if (lc.nonEmpty) srcL.addData(lc.map { case (u, ms, id) => (u, tsMs(ms), id) }: _*)
          if (rc.nonEmpty) srcR.addData(rc.map { case (u, ms, id, v) => (u, tsMs(ms), id, v) }: _*)
          q.processAllAvailable()
        }
        // flush: sentinels far past span + delay
        srcR.addData((99L, tsMs(B + 20000000000L), 990L, 0.0)); q.processAllAvailable()
        srcR.addData((99L, tsMs(B + 20000001000L), 991L, 0.0)); q.processAllAvailable()

        val streamed = spark.table(sink).where($"user_id" < 99)
          .select($"event_id", $"sec", $"ref_sec", $"ref_rid", $"ref_value")
          .as[(Long, Long, Long, Long, Double)].collect().toSet

        val batch = AsOfJoin.asOf(
            lefts.map { case (u, ms, id) => (u, tsMs(ms), id) }
              .toDF("user_id", "ts", "event_id"),
            AsOfJoin.latestPerKeyTs(
              rights.map { case (u, ms, id, v) => (u, tsMs(ms), id, v) }
                .toDF("user_id", "ts", "rid", "value"), "user_id", "ts", "rid")
              .withColumn("r_sec", unix_timestamp(col("ts"))),
            "user_id", "ts",
            Map("r_sec" -> "ref_sec", "rid" -> "ref_rid", "value" -> "ref_value"))
          .select($"event_id", unix_timestamp($"ts").as("sec"),
            coalesce($"ref_sec", lit(-1L)), coalesce($"ref_rid", lit(-1L)),
            coalesce($"ref_value", lit(-1.0)))
          .as[(Long, Long, Long, Long, Double)].collect().toSet

        assert(streamed == batch,
          s"seed $seed: only-stream=${streamed -- batch}, only-batch=${batch -- streamed}")
      } finally q.stop()
    }
  }

  test("a left with no prior right emits -1 sentinels, exactly once") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val srcL = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val srcR = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val out = StreamingAsOf.asOfStream(
      srcL.toDF().toDF("user_id", "ts", "event_id"),
      srcR.toDF().toDF("user_id", "ts", "rid", "value"), "0 seconds")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("asof_nomatch").start()
    try {
      srcL.addData((5L, ts(100), 50L))
      q.processAllAvailable()
      srcR.addData((9L, ts(500), 90L, 9.0)) // advance watermark past 100
      q.processAllAvailable()
      srcR.addData((9L, ts(501), 91L, 9.1))
      q.processAllAvailable()
      val got = spark.table("asof_nomatch")
        .select($"user_id", $"event_id", $"ref_sec", $"ref_rid", $"ref_value")
        .as[(Long, Long, Long, Long, Double)].collect().toSeq
      assert(got == Seq((5L, 50L, -1L, -1L, -1.0)), s"got $got")
      // drained-key state removal, via the query's own state metrics:
      // key 5 emitted and removed its state; only key 9's standing
      // right remains → exactly ONE state row
      val stateRows = q.recentProgress.reverse.flatMap(_.stateOperators)
        .headOption.map(_.numRowsTotal)
      assert(stateRows.contains(1L), s"expected 1 standing state row, got $stateRows")
    } finally q.stop()
  }
}

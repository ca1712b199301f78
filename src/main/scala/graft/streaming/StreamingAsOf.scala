package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** EXACT event-time as-of join on a stream — an operator Structured
  * Streaming has no builtin for (stream-stream joins support interval
  * conditions but not "most recent at-or-before" semantics, and the
  * naive latest-value-state approach is wrong under out-of-order
  * arrival: a right row landing late but before an unmatched left's
  * event time must still win the match).
  *
  * Design: both sides union into ONE keyed stream (so they share a
  * watermark), then `flatMapGroupsWithState` buffers per key:
  *
  *  - a left row is emitted only once the watermark passes its event
  *    time — at that point no right row at-or-before it can still
  *    arrive, so the match is FINAL (exactly the batch semantics;
  *    StreamingAsOfSpec asserts stream ≡ `AsOfJoin.asOf` under
  *    shuffled cross-batch arrival orders, including sub-second
  *    timestamps).
  *  - all comparisons run at MICROSECOND precision (the timestamp
  *    type's full resolution — `Timestamp.getTime` alone would
  *    truncate to milliseconds and silently diverge from the batch
  *    twin on real data, whose event times carry fractional seconds).
  *  - state is minimal by construction: pending lefts are only those
  *    inside the watermark delay, and of the rights behind the
  *    watermark only the single LATEST survives (it is the standing
  *    as-of value for every future left; older rights are dominated).
  *    Steady-state size per key is O(rate × watermarkDelay) + 1 —
  *    unbounded streams run forever in bounded memory, and fully
  *    drained keys remove their state (StreamingAsOfSpec asserts the
  *    post-drain numRowsTotal from the query's state metrics).
  *
  * Same tie rule as the batch operator's `latestPerKeyTs`: among right
  * rows sharing a timestamp the highest `rid` wins. No-match lefts
  * emit -1 sentinels (the batch query q_asof_join coalesces to the
  * same sentinels).
  */
object StreamingAsOf {

  final case class RightRow(us: Long, rid: Long, value: Double)
  final case class LeftRow(us: Long, eventId: Long)
  /** Per-key buffers (public: the state encoder constructs it). */
  final case class AsOfBuf(rights: Seq[RightRow], lefts: Seq[LeftRow])
  final case class AsOfMatch(user_id: Long, event_id: Long, sec: Long,
                             ref_sec: Long, ref_rid: Long, ref_value: Double)

  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  /** `left`: (user_id, ts, event_id); `right`: (user_id, ts, rid,
    * value). Returns the finalized matches, one row per left event;
    * output times are floored to epoch seconds (matching q_asof_join's
    * surface) but matching itself is microsecond-exact. */
  def asOfStream(left: DataFrame, right: DataFrame,
                 watermarkDelay: String = "30 minutes"): Dataset[AsOfMatch] = {
    val spark = left.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    val l = left.select(col("user_id").cast("long"), col("ts").cast("timestamp"),
      lit(1).as("side"), col("event_id").cast("long").as("id"), lit(0.0).as("value"))
    val r = right.select(col("user_id").cast("long"), col("ts").cast("timestamp"),
      lit(0).as("side"), col("rid").cast("long").as("id"), col("value").cast("double"))

    r.unionByName(l)
      .withWatermark("ts", watermarkDelay)
      .as[(Long, java.sql.Timestamp, Int, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[AsOfBuf, AsOfMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Int, Long, Double)],
         state: GroupState[AsOfBuf]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val buf = state.getOption.getOrElse(AsOfBuf(Nil, Nil))
          val newRights = scala.collection.mutable.ListBuffer.empty[RightRow]
          val newLefts = scala.collection.mutable.ListBuffer.empty[LeftRow]
          rows.foreach { case (_, ts, side, id, value) =>
            if (side == 0) newRights += RightRow(micros(ts), id, value)
            else newLefts += LeftRow(micros(ts), id)
          }
          // strictly-less: a future row may still carry an event time
          // equal to the watermark, so a left AT it is not final yet
          val (ready, pending) =
            (buf.lefts ++ newLefts).partition(_.us < wmUs)
          // buf.rights is stored sorted; only the delta needs sorting
          val sortedRights =
            merge(buf.rights, newRights.sortBy(rr => (rr.us, rr.rid)).toList)
          val out = ready.sortBy(lr => (lr.us, lr.eventId)).map { lr =>
            // latest right at-or-before the left; ties on us → max rid
            // (sorted order makes it the LAST qualifying element)
            sortedRights.foldLeft(Option.empty[RightRow]) { (acc, rr) =>
              if (rr.us <= lr.us) Some(rr) else acc
            } match {
              case Some(rr) =>
                AsOfMatch(user, lr.eventId, lr.us / 1000000L,
                  rr.us / 1000000L, rr.rid, rr.value)
              case None => AsOfMatch(user, lr.eventId, lr.us / 1000000L, -1L, -1L, -1.0)
            }
          }
          // evict: rights at-or-past the watermark all stay (any may be
          // the match of a future left); of those behind it only the
          // latest survives — it dominates for every left still to come
          val (behind, ahead) = sortedRights.partition(_.us < wmUs)
          val keptRights = behind.lastOption.toSeq ++ ahead
          if (keptRights.isEmpty && pending.isEmpty) state.remove()
          else {
            state.update(AsOfBuf(keptRights, pending))
            if (pending.nonEmpty)
              // re-invoke when the watermark passes the oldest pending
              // left (must be strictly after the current watermark)
              state.setTimeoutTimestamp(
                math.max(pending.map(_.us).min / 1000L + 1,
                  state.getCurrentWatermarkMs() + 1))
          }
          out.iterator
      }
  }

  /** Merge two (us, rid)-sorted right-row sequences. */
  private def merge(a: Seq[RightRow], b: Seq[RightRow]): Seq[RightRow] = {
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val out = scala.collection.mutable.ListBuffer.empty[RightRow]
      val (ia, ib) = (a.iterator.buffered, b.iterator.buffered)
      while (ia.hasNext && ib.hasNext) {
        val keyA = (ia.head.us, ia.head.rid)
        val keyB = (ib.head.us, ib.head.rid)
        out += (if (Ordering[(Long, Long)].lteq(keyA, keyB)) ia.next() else ib.next())
      }
      out ++= ia
      out ++= ib
      out.toList
    }
  }
}

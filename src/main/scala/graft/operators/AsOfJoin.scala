package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join — for each left row, attach the most
  * recent right row with the same key whose timestamp is at or before
  * the left row's timestamp. The classic financial/feature-store lookup
  * ("what was the last quote/feature value when this trade/event
  * happened"), an operator Spark has no builtin for.
  *
  * Scale shape — union + ONE window pass, not a join:
  * both sides are tagged and unioned, then a single
  * `last(..., ignoreNulls)` running window partitioned by key and
  * ordered by (ts, side) carries each right payload forward onto the
  * left rows that follow it. That is ONE shuffle on the key (the
  * window exchange) and zero join state: no per-key driver loops, no
  * range-expansion blowup, and skewed keys cost exactly one partition's
  * sort. A sort-merge range join would shuffle BOTH sides too but then
  * pay an O(|L|·|R|) per-key merge in the worst case; the union-window
  * form is linear in |L|+|R| after the sort. At 100 TB both sides are
  * time-partitioned parquet/Iceberg, the union is partition-pruned to
  * the lookback horizon, and the one exchange is the whole cost.
  *
  * Right rows sort BEFORE left rows at equal timestamps (side 0 < 1),
  * so the match is inclusive (`right.ts <= left.ts`). Callers must
  * pre-deduplicate the right side to one row per (key, ts) if several
  * right rows can share a timestamp — [[latestPerKeyTs]] does this
  * deterministically — otherwise "the" most recent row is ill-defined.
  */
object AsOfJoin {

  /** Deterministic one-row-per-(key, ts): keeps the row with the
    * highest tiebreaker column. Map-side partial `WindowGroupLimit`
    * applies before the exchange, same as the candidate-cap plan. */
  def latestPerKeyTs(df: DataFrame, key: String, ts: String, tiebreak: String): DataFrame =
    WindowOps.keepTopRow(df, Seq(col(key), col(ts)), Seq(col(tiebreak).desc))

  /** Left as-of join. `payload` maps right-side column name → output
    * column name; left columns pass through unchanged. Rows with no
    * prior right row keep null payloads (left-outer semantics).
    *
    * The payloads ride in ONE struct per right row and the window
    * carries that struct with a single `last(ignoreNulls)` — carrying
    * each column independently would back-fill a NULL field of the most
    * recent right row from an OLDER right row, fabricating a torn row
    * no engine ever saw. The struct is atomic: the matched row's null
    * fields stay null, exactly like a real as-of join. */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           payload: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(leftCols.contains(key) && leftCols.contains(ts), s"left needs $key/$ts")
    val outNames = payload.values.toSeq
    require(outNames.distinct.size == outNames.size, "payload output names collide")
    require(outNames.forall(o => !leftCols.contains(o)),
      s"payload output names ${outNames.filter(leftCols.contains)} collide with left columns")

    // union schema: key, ts, side, left passthroughs (null on right
    // rows), and the right payload struct (null — as a whole — on left
    // rows)
    val passthrough = leftCols.filterNot(c => c == key || c == ts)
    val payloadStruct = struct(payload.toSeq.map { case (rc, out) => col(rc).as(out) }: _*)
    val taggedRight = right.select(
      Seq(col(key), col(ts), lit(0).as("__side")) ++
        passthrough.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        payloadStruct.as("__p"): _*)
    val structType = taggedRight.schema("__p").dataType
    val taggedLeft = left.select(
      Seq(col(key), col(ts), lit(1).as("__side")) ++
        passthrough.map(col) :+
        lit(null).cast(structType).as("__p"): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(Seq(col(key), col(ts)) ++ passthrough.map(col) ++
        outNames.map(o => col(s"__p.$o").as(o)): _*)
  }

  /** Interval (range) join: pairs (a, b) on the same key with
    * `b.ts` in `[a.ts, a.ts + windowSec]`. Declared as a plain join
    * with an equi-key plus a range predicate so Catalyst plans the
    * equi-part as a hash/sort-merge join and evaluates only the range
    * residual per key group — never a cross product. Skewed keys go
    * through AQE skew-split; at 100 TB both sides are additionally
    * bucketed by key so the equi-join is exchange-free.
    */
  def intervalJoin(a: DataFrame, b: DataFrame, key: String, ts: String,
                   windowSec: Long, aPrefix: String = "a_", bPrefix: String = "b_"): DataFrame = {
    val ra = a.columns.foldLeft(a)((d, c) => d.withColumnRenamed(c, aPrefix + c))
    val rb = b.columns.foldLeft(b)((d, c) => d.withColumnRenamed(c, bPrefix + c))
    val cond: Column =
      col(aPrefix + key) === col(bPrefix + key) &&
        col(bPrefix + ts) >= col(aPrefix + ts) &&
        col(bPrefix + ts) <= col(aPrefix + ts) + expr(s"INTERVAL $windowSec SECONDS")
    ra.join(rb, cond)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adaptive (learned) disjunctive blocking-scheme selection — the
  * "which keys do I actually run?" layer on top of the individual
  * blocking channels (Bilenko, Kamath & Mooney, "Adaptive Blocking:
  * Learning to Scale Up Record Linkage", ICDM 2006; Michelson & Knoblock
  * AAAI 2006 — public papers). Given candidate channels (each a pair
  * set) and a labeled truth sample, greedily build the disjunction:
  * at every step pick the channel with the best MARGINAL
  * truth-coverage-per-candidate-pair ratio against everything already
  * selected, until no channel adds coverage.
  *
  * Determinism: channels are evaluated against the ratio
  * `marginal_truth / marginal_pairs` as an IEEE double of two exact
  * integer counts (identical in any engine), ties and the np = 0 case
  * (ratio 0) broken by scheme name — the DuckDB oracle replays the
  * whole chain step by step and must reproduce every evaluation row
  * AND every pick.
  *
  * Scale shape: the only driver-side data is the per-step per-channel
  * COUNT pairs (≤ |channels|² rows total); the marginal sets are
  * anti-joins of pair tables (each channel's own capped/purged
  * generator bounds its size), and the selected union is re-persisted
  * per step with lineage truncation — the same bounded-loop discipline
  * as the MIS/match-merge rounds. The truth sample is a labeled
  * SAMPLE by design (Bilenko's setting): at corpus scale it is the
  * clerical-review output, thousands of rows, never all-pairs.
  */
object BlockingScheme {

  /** One evaluation row of the greedy chain: channel `scheme` offered
    * `marginalTruth` newly-covered truth pairs at `marginalPairs`
    * newly-added candidate pairs in step `step`; `chosen` marks the
    * greedy pick of that step. */
  final case class Eval(step: Int, scheme: String, marginalTruth: Long,
      marginalPairs: Long, chosen: Boolean)

  /** `channels`: (name, pairs) with pair columns (tokA, tokB), tokA <
    * tokB; `truth`: the labeled matching pairs, same columns. Runs
    * |channels| steps (a channel whose marginal coverage is 0 still
    * gets picked eventually — emitting the full chain keeps the output
    * shape static; consumers cut at the first zero-coverage pick). */
  def greedyChain(channels: Seq[(String, DataFrame)], truth: DataFrame): Seq[Eval] = {
    require(channels.map(_._1).distinct.size == channels.size, "duplicate channel name")
    val out = scala.collection.mutable.ArrayBuffer.empty[Eval]
    var selected: Option[DataFrame] = None
    var remaining = channels.sortBy(_._1)
    var step = 1
    // truth pairs are unique (tokA < tokB), so a left join tags without
    // fanning out and ONE aggregate yields both counts per channel
    val truthTagged = truth.select(col("tokA"), col("tokB"))
      .withColumn("__t", lit(true))
    while (remaining.nonEmpty) {
      // evaluate ALL remaining channels in one tagged pass: per step one
      // union + one anti-join + one grouped aggregate (2 Spark jobs was
      // per CHANNEL before — persist/count/join-count/unpersist — ~20
      // actions for 4 channels; now it is one action per step). The
      // marginal set algebra per channel is unchanged: rows are disjoint
      // across the scheme tag, so the shared anti-join against the
      // selected union prunes each channel exactly as its own did.
      val tagged = remaining.map { case (nm, df) =>
        df.select(col("tokA"), col("tokB")).withColumn("scheme", lit(nm))
      }.reduce(_ unionByName _)
      val fresh = selected.fold(tagged)(s =>
        tagged.join(s, Seq("tokA", "tokB"), "left_anti"))
      val counted = fresh.join(truthTagged, Seq("tokA", "tokB"), "left")
        .groupBy(col("scheme"))
        .agg(count(lit(1)).as("np"), count(col("__t")).as("mt"))
        .collect()
        .map(r => r.getString(0) -> (r.getLong(2), r.getLong(1))).toMap
      // a channel fully covered by the selection has no surviving rows,
      // hence no group — it still reports an explicit (0, 0) row
      val stats = remaining.map { case (nm, _) =>
        val (mt, np) = counted.getOrElse(nm, (0L, 0L))
        (nm, mt, np)
      }
      def ratio(mt: Long, np: Long): Double =
        if (np == 0L) 0.0 else mt.toDouble / np
      val best = stats.sortBy { case (nm, mt, np) => (-ratio(mt, np), nm) }.head._1
      out ++= stats.map { case (nm, mt, np) => Eval(step, nm, mt, np, nm == best) }
      val bestDf = remaining.find(_._1 == best).get._2
        .select(col("tokA"), col("tokB"))
      selected = Some(selected.fold(bestDf)(_.unionByName(bestDf))
        .distinct().localCheckpoint(true))
      remaining = remaining.filterNot(_._1 == best)
      step += 1
    }
    out.toSeq
  }
}

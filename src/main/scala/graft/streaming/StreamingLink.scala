package graft.streaming

import graft.operators.OneToOneMatching
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental one-to-one linkage: fold micro-batches of cross-catalog
  * candidate edges and keep the greedy maximum-weight 1:1 matching
  * current after every batch.
  *
  * Greedy matching is NOT incrementally maintainable under edge
  * insertion: one new heavy edge can displace both its endpoints'
  * standing matches and the displaced partners' next-best edges cascade
  * arbitrarily far (the same structural argument as connected components
  * under deletion — [[graft.operators.Clustering.retract]]). The honest
  * design therefore retains the cumulative ACCEPTED-edge set (small by
  * construction: FS-accepted pairs, ~O(#records), not candidate pairs)
  * and re-matches it per batch; the measured geometric round decay
  * (BENCH.md — 6 rounds at 2M edges) makes the re-match cheap relative
  * to the scoring that produced the edges. At deployment scale the edge
  * set is a `TableIO`-backed table exactly like
  * [[StreamingEr]]'s match state; the in-memory state here keeps the
  * semantics testable without a metastore.
  *
  * Replay guard: edges are keyed by (lft, rgt) and duplicates keep the
  * MAX weight, so at-least-once redelivery — same pair, same weight —
  * is idempotent, and a re-scored pair deterministically upgrades.
  */
object StreamingLink {

  final case class LinkState(edges: DataFrame, matched: DataFrame, batches: Int)

  /** Fold one micro-batch of edges (lft, rgt, w) into `prev`. Returns
    * the new state: cumulative deduplicated edges and the matching over
    * them — identical, including round numbers, to
    * [[OneToOneMatching.greedyMatch]] over all edges seen so far. */
  def update(
      spark: SparkSession,
      newEdges: DataFrame,
      prev: Option[LinkState]): LinkState = {
    val batch = newEdges.select(col("lft"), col("rgt"), col("w"))
    val all = prev.map(_.edges.unionByName(batch)).getOrElse(batch)
      .groupBy(col("lft"), col("rgt")).agg(max(col("w")).as("w"))
      .localCheckpoint(true)
    val matched = OneToOneMatching.greedyMatch(all).localCheckpoint(true)
    LinkState(all, matched, prev.map(_.batches).getOrElse(0) + 1)
  }

  /** Durable twin of [[update]]: state round-trips through `io`
    * (`_SUCCESS`-gated tables, one generation per batch), so a crashed
    * stream RESUMES at the last complete batch — the same
    * kill-and-resume contract as StreamingEr's checkpointed path. The
    * cumulative edge table is the authoritative state; the matched
    * table is written alongside so readers never pay a re-match.
    * Generation bookkeeping is [[StateGenerations]] over
    * `io.listTables` (the io the state is written with is the ONE
    * source of truth for what exists — no separate rootDir that could
    * drift and silently resume from empty, and catalog-backed TableIOs
    * work unchanged): a crash between the two writes leaves a half
    * generation, which `latestComplete` skips and the retried batch
    * overwrites, and generations older than `retain` are
    * garbage-collected — storage stays O(retain), not O(batches), and a
    * listing (not a scan-from-zero) finds the resume point, so pruned
    * early generations can never make a restart silently begin from
    * empty (the failure mode of the pre-round-5 exists-counting loop
    * this replaced). GC deletes the edges table LAST: generations are
    * keyed by the edges prefix, so deleting the keyed table first and
    * crashing would orphan a matched table no later prune can find. */
  def updateDurable(
      spark: SparkSession,
      newEdges: DataFrame,
      io: graft.sources.TableIO,
      prefix: String = "slink",
      retain: Int = 2): LinkState = {
    require(retain >= 1, s"retain must be >= 1 (got $retain): retain 0 " +
      "would GC the generation just written and destroy all durable state")
    val (prev, k) = resumeState(spark, io, prefix)
    val next = update(spark, newEdges, prev)
    io.write(next.edges, s"${prefix}_edges_b$k")
    io.write(next.matched, s"${prefix}_matched_b$k")
    // GC listing is listTablesAll: a remnant that lost its _SUCCESS in
    // a crashed delete must still be visible to later prunes
    StateGenerations.prune(
      StateGenerations.fromNames(
        io.listTablesAll(spark, s"${prefix}_edges_b"), s"${prefix}_edges_b"),
      k - retain) { g =>
      io.delete(spark, s"${prefix}_matched_b$g")
      io.delete(spark, s"${prefix}_edges_b$g") // keyed table last
    }
    next
  }

  /** Latest COMPLETE generation under `prefix` (both tables present)
    * rebuilt as a LinkState, plus the generation index the NEXT batch
    * writes. */
  def resumeState(
      spark: SparkSession,
      io: graft.sources.TableIO,
      prefix: String): (Option[LinkState], Int) = {
    val gens = StateGenerations.fromNames(
      io.listTables(spark, s"${prefix}_edges_b"), s"${prefix}_edges_b")
    val complete = (g: Int) =>
      io.exists(spark, s"${prefix}_edges_b$g") &&
        io.exists(spark, s"${prefix}_matched_b$g")
    StateGenerations.latestComplete(gens, complete) match {
      case None => (None, 0)
      case Some(g) => (Some(LinkState(
        edges = io.read(spark, s"${prefix}_edges_b$g"),
        matched = io.read(spark, s"${prefix}_matched_b$g"),
        batches = g + 1)), g + 1)
    }
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage 4: transitive closure of the match graph — connected components
  * via alternating large-star / small-star DataFrame self-joins
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14 — public paper; required shape per BASELINE.json north_star).
  *
  * The reference has no clustering (SURVEY.md §3b): its "entity
  * clusters" in the north_rule are the components of the thresholded
  * ZSS match graph, computed here.
  *
  * Scale notes: converges in O(log n) rounds (vs O(diameter) for naive
  * label propagation); each round is two shuffles (groupBy min + join).
  * `localCheckpoint(eager)` after every round truncates the lineage so
  * the plan does not grow with iterations — at cluster scale swap for
  * reliable `checkpoint()` on durable storage (TableIO). Convergence is
  * detected by an order-independent (count, sum-of-edge-hashes)
  * signature — one tiny aggregate per round, no `except()` anti-join.
  */
object Clustering {

  /** edges: DataFrame(idA, idB) undirected; nodes: DataFrame(id) — the
    * full node universe, so singletons get their own cluster.
    * Returns DataFrame(id, clusterId) with clusterId = min member id. */
  def connectedComponents(edges: DataFrame, nodes: DataFrame, maxIter: Int = 30): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    // orient every edge large → small and dedupe
    var e = edges
      .select(greatest($"idA", $"idB").as("src"), least($"idA", $"idB").as("dst"))
      .where($"src" =!= $"dst")
      .distinct()
      .localCheckpoint(true)

    // one large-star + small-star round as a lazy plan transform
    def starRound(in: DataFrame): DataFrame = {
      // ---- large-star: for every node u, attach all strictly-larger
      // neighbors to m = min(N(u) ∪ {u})
      val und = in.select($"src", $"dst")
        .union(in.select($"dst".as("src"), $"src".as("dst")))
      val mins = und.groupBy($"src").agg(min($"dst").as("mn"))
        .select($"src", least($"src", $"mn").as("mn"))
      // no distinct here: both consumers absorb duplicates for free —
      // mins2 is a min-aggregate and the round ends in its own distinct
      // — so the dedup exchange was one pure-overhead shuffle per round
      // (guide §2.4: remove shuffles outright; duplicate (src,dst) rows
      // are bounded by neighbor degree, they never amplify)
      val ls = und.join(mins, "src")
        .where($"dst" > $"src")
        .select($"dst".as("src"), $"mn".as("dst"))
        .where($"src" =!= $"dst")

      // ---- small-star: edges are src > dst; attach u and all its
      // smaller neighbors to their min
      val mins2 = ls.groupBy($"src").agg(min($"dst").as("mn"))
      val j = ls.join(mins2, "src")
      j.select($"src", $"mn".as("dst"))
        .union(j.where($"dst" =!= $"mn").select($"dst".as("src"), $"mn".as("dst")))
        .where($"src" =!= $"dst")
        .distinct()
    }

    var sigPrev = signature(e)
    var converged = sigPrev._1 == 0L
    var iter = 0
    while (!converged && iter < maxIter) {
      // ONE star round per materialization. (Unrolling TWO rounds per
      // checkpoint to halve the action count was measured 2.5× SLOWER
      // on the sf0.1 match graph — 2.3 s → 5.9 s, 27 → 44 jobs: the
      // doubled lazy tree defeats exchange reuse and AQE re-materializes
      // the duplicated subtrees as extra stage jobs.)
      val ss = starRound(e).localCheckpoint(true)
      val sig = signature(ss)
      converged = sig == sigPrev
      sigPrev = sig
      e = ss
      iter += 1
    }

    val memberToRoot = e.select($"src".as("id"), $"dst".as("clusterId"))
    val roots = e.select($"dst".as("id")).distinct().withColumn("clusterId", $"id")
    val connected = memberToRoot.union(roots)
      .groupBy($"id").agg(min($"clusterId").as("clusterId"))
    val singletons = nodes.select($"id")
      .join(connected.select($"id"), Seq("id"), "left_anti")
      .withColumn("clusterId", $"id")
    connected.union(singletons)
  }

  /** Retraction (right-to-erasure / file deletion at corpus scale):
    * recompute clusters after removing `deleted` ids — surviving nodes
    * keep only edges whose BOTH endpoints survive, then components are
    * re-derived. CC is not incrementally maintainable under deletion
    * (removing a bridge node splits a component), so the honest shape is
    * a recompute over the retained match-edge table — which the pipeline
    * already persists, so nothing is re-scored. No explicit broadcast
    * hint: a typically-tiny delete set auto-broadcasts under the
    * threshold, while a corpus-proportional purge (er_retract deletes a
    * 1/16 slice) must stay a shuffled anti-join rather than blow the
    * broadcast limit. */
  def retract(edges: DataFrame, nodes: DataFrame, deleted: DataFrame): DataFrame = {
    val del = deleted.select(col("id")).distinct()
    val keepNodes = nodes.join(del, Seq("id"), "left_anti")
    val keepEdges = edges
      .join(del.withColumnRenamed("id", "idA"), Seq("idA"), "left_anti")
      .join(del.withColumnRenamed("id", "idB"), Seq("idB"), "left_anti")
    connectedComponents(keepEdges, keepNodes)
  }

  /** Order-independent pair-set signature: (count, bit_xor of xxhash64).
    * xor (not sum) — ANSI mode makes a Long sum of hashes overflow; the
    * pair set is distinct so xor-cancellation of duplicates is moot.
    * One aggregate job total (count doubles as the emptiness probe; the
    * xor is null on empty input, coalesced). Shared convergence probe
    * for every fixpoint loop in this package ([[connectedComponents]],
    * [[HashToMin.connectedComponents]]). */
  private[operators] def pairSignature(df: DataFrame, a: String, b: String)
      : (Long, Long) = {
    val r = df.agg(count(lit(1)),
      expr(s"coalesce(bit_xor(xxhash64($a, $b)), 0L)")).head()
    (r.getLong(0), r.getLong(1))
  }

  private def signature(e: DataFrame): (Long, Long) =
    pairSignature(e, "src", "dst")
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Clerical-feedback constrained clustering — the steward loop every
  * production ER deployment runs on top of its automatic matcher
  * (the "possible" region of er_fs_review feeds humans; their answers
  * come back as pairwise constraints):
  *
  *   - MUST-LINK pairs are added to the candidate edge set;
  *   - CANNOT-LINK pairs are removed from it;
  *   - components are re-derived over the edited edges;
  *   - a cannot-link pair can STILL end up co-clustered through an
  *     indirect path (optimal constrained correlation clustering is
  *     NP-hard), so residual violations are REPAIRED by a minimal
  *     deterministic rule: evict the π-larger endpoint (π = md5(id)‖id,
  *     the same shared order [[PivotClustering]] uses) of every
  *     violated pair to a singleton cluster. Exactly one endpoint of
  *     each violated pair is π-larger, so after one eviction pass NO
  *     cannot-link pair is co-clustered — by construction, not by
  *     iteration;
  *   - the repair is honestly ACCOUNTED: eviction can strand a
  *     must-link partner (the evicted node leaves its confirmed pair)
  *     and can disconnect a cluster it was bridging — both are
  *     reported, not hidden, because the steward needs to know what
  *     the repair traded (see er_feedback_report's n_must_broken and
  *     the before/after B³ in the same row).
  *
  * Scale shape: edge edits are two distincts + one anti-join; the
  * clustering is the existing large-star/small-star CC; violations are
  * one join of the cannot set against the assignment; the evict set is
  * a projection of the violations. Nothing new shuffles beyond the CC
  * itself.
  */
object Feedback {

  private def pi(c: org.apache.spark.sql.Column) = concat(md5(c), c)

  /** edges/must/cannot: (idA, idB) unordered pairs; nodes: (id).
    * Returns (id, clusterId, evicted) — clusterId after the edit +
    * repair; evicted = 1 for nodes moved to singletons by the repair. */
  def constrainedClusters(edges: DataFrame, must: DataFrame,
                          cannot: DataFrame, nodes: DataFrame): DataFrame = {
    val cc = Clustering.connectedComponents(
      editedEdges(edges, must, cannot), nodes)
    applyEvictions(cc, evictions(cc, cannot, must))
  }

  /** The steward-edited edge set: candidate ∪ must-links, cannot-links
    * removed — the CC input of [[constrainedClusters]], exposed so a
    * caller that also needs the intermediate component assignment can
    * run the (iterative, expensive) CC exactly once and compose the
    * final clusters with [[applyEvictions]]. */
  def editedEdges(edges: DataFrame, must: DataFrame,
                  cannot: DataFrame): DataFrame =
    edges.select(col("idA"), col("idB"))
      .unionByName(must.select(col("idA"), col("idB")))
      .distinct()
      .join(cannot.select(col("idA"), col("idB")), Seq("idA", "idB"), "left_anti")

  /** The repair step of [[constrainedClusters]] over a precomputed
    * assignment + eviction set — identical output, no second CC run. */
  def applyEvictions(cc: DataFrame, ev: DataFrame): DataFrame =
    cc.join(ev, Seq("id"), "left")
      .select(col("id"),
        // "ev:" prefix: an evicted node that was its cluster's MIN
        // member leaves its id behind as the remnant's label — a bare
        // id would co-label the singleton with the cluster it just left
        when(col("ev"), concat(lit("ev:"), col("id")))
          .otherwise(col("clusterId")).as("clusterId"),
        coalesce(col("ev"), lit(false)).cast("int").as("evicted"))

  /** Evicted endpoints of cannot-link pairs co-clustered in `assign`:
    * (id, ev=true). Constraint priority is must > cannot (the standard
    * ordering — a steward's confirmed pair outranks a rejected one), so
    * when exactly one endpoint has a must-link partner the OTHER one is
    * evicted; only symmetric cases fall back to the π-larger rule. */
  def evictions(assign: DataFrame, cannot: DataFrame,
                must: DataFrame): DataFrame = {
    val hasMust = must.select(col("idA").as("id"))
      .unionByName(must.select(col("idB").as("id")))
      .distinct().withColumn("hm", lit(true))
    cannot
      .join(assign.select(col("id").as("idA"), col("clusterId").as("cA")), "idA")
      .join(assign.select(col("id").as("idB"), col("clusterId").as("cB")), "idB")
      .where(col("cA") === col("cB"))
      .join(hasMust.select(col("id").as("idA"), col("hm").as("hmA")), Seq("idA"), "left")
      .join(hasMust.select(col("id").as("idB"), col("hm").as("hmB")), Seq("idB"), "left")
      .select(
        when(coalesce(col("hmA"), lit(false)) && !coalesce(col("hmB"), lit(false)),
          col("idB"))
          .when(coalesce(col("hmB"), lit(false)) && !coalesce(col("hmA"), lit(false)),
            col("idA"))
          .when(pi(col("idA")) > pi(col("idB")), col("idA"))
          .otherwise(col("idB")).as("id"))
      .distinct()
      .withColumn("ev", lit(true))
  }
}

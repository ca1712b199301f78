package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Canopy clustering as a blocking scheme (McCallum, Nigam & Ungar,
  * "Efficient clustering of high-dimensional data sets with application
  * to reference matching", KDD 2000): a CHEAP metric partitions the
  * data into overlapping canopies under two thresholds — any point
  * within the LOOSE threshold T1 of a canopy center joins that canopy;
  * points within the TIGHT threshold T2 of a center stop being center
  * candidates. The expensive comparator then runs only inside canopies.
  * The third complementary blocking scheme over the token vocabulary,
  * next to [[Phonetic]] (sound-alike) and [[SuffixBlocking]] (shared
  * ending): the cheap metric here is character-bigram Jaccard, which
  * catches rearrangements and mid-word edits neither of those keys on.
  *
  * Sequential-equivalence. The classic loop (pick the π-first remaining
  * candidate as a center; remove its T2-neighbors from the candidate
  * pool) selects exactly the lexicographically-first greedy MIS of the
  * T2 graph under π — a point becomes a center iff no π-earlier center
  * is T2-close — so centers are computed distributively by
  * [[PivotClustering.cluster]]'s parallel MIS rounds (π = md5(id) ‖ id,
  * the shared cross-engine order), and membership is one join of the
  * center set against the T1 edge list. Every point is a center or a
  * T2-neighbor of one (MIS maximality), so T1 ⊇ T2 coverage is total
  * by construction.
  *
  * Scale shape (100 TB): the T1 edge list is the EXACT prefix-filtered
  * set-similarity join ([[SetSimJoin]] — no all-pairs scan, no false
  * negatives), MIS rounds shrink geometrically, membership is one
  * equi-join. The DuckDB oracle replays everything: bigram sets and
  * brute-force Jaccard from the raw documents (which also re-proves the
  * prefix filter's completeness on this input), the unrolled MIS round
  * chain under its OWN md5 order, and the membership join.
  */
object Canopy {

  /** Loose/tight Jaccard thresholds as exact rationals (≥ num/den) —
    * integer-exact in both engines; ONE definition, interpolated into
    * the oracle SQL. T2 ⊆ T1 requires Tight ≥ Loose. */
  val LooseNum = 1; val LooseDen = 4
  val TightNum = 1; val TightDen = 2

  /** Distinct character bigrams — the cheap metric's feature set.
    * Guarded: Spark's `sequence(1, 0)` descends rather than emitting
    * an empty array, so length-1 tokens need the explicit branch. */
  def bigrams(tok: Column): Column =
    when(length(tok) >= 2,
      array_distinct(transform(sequence(lit(1), length(tok) - 1),
        i => tok.substr(i, lit(2)))))
      .otherwise(array().cast("array<string>"))

  /** T1 edge list over a vocabulary with column `tok`: exact set-sim
    * join at the loose threshold, each edge tagged with its tight
    * verdict. (idA < idB, columns isect / union_n integer-exact.) */
  def edges(vocab: DataFrame): DataFrame =
    SetSimJoin.join(
        vocab.where(length(col("tok")) >= 2)
          .select(col("tok").as("id"), bigrams(col("tok")).as("toks")),
        LooseNum, LooseDen)
      .withColumn("tight",
        col("isect") * TightDen >= col("union_n") * TightNum)

  /** Canopy membership (center, member, jacc): centers via the parallel
    * greedy MIS over the tight graph (`nodes` = the full vocabulary, so
    * tokens with no tight neighbor — including bigram-less length-1
    * tokens — become their own canopies), membership = the center plus
    * every loose neighbor. Canopies OVERLAP by design: a member within
    * T1 of two centers belongs to both. */
  def canopies(edges: DataFrame, nodes: DataFrame): DataFrame = {
    val t2 = edges.where(col("tight"))
      .select(col("idA").as("src"), col("idB").as("dst"))
    val centers = PivotClustering.cluster(t2, nodes.select(col("tok").as("id")))
      .where(col("is_pivot") === 1)
      .select(col("id").as("center"))
    val und = edges
      .select(col("idA").as("center"), col("idB").as("member"),
        col("isect"), col("union_n"))
      .unionByName(edges.select(col("idB").as("center"),
        col("idA").as("member"), col("isect"), col("union_n")))
    centers.join(und, "center")
      .select(col("center"), col("member"),
        round(col("isect").cast("double") / col("union_n"), 6).as("jacc"))
      .unionByName(centers.select(col("center"),
        col("center").as("member"), lit(1.0).as("jacc")))
  }

  /** Co-canopy candidate pairs (tokA < tokB, deduplicated across
    * canopies) — the block-then-verify surface the expensive comparator
    * reads. Routed through the shared CAPPED generator: a hub center
    * whose loose neighborhood degenerates (many short tokens over a
    * small alphabet) is bounded by `cap` exactly like every other
    * blocking channel, so the per-canopy collect can never OOM an
    * executor at 10^12-row scale. */
  def candidatePairs(can: DataFrame, cap: Int = Dedup.DefaultBlockCap): DataFrame =
    CandidateGen.pairsFromKeys(
        can.select(col("center").as("key"), col("member").as("id")), cap)
      .select(col("idA").as("tokA"), col("idB").as("tokB"))
}

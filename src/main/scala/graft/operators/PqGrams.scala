package graft.operators

import graft.model.TreeRow
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** pq-gram profiles and distance (Augsten, Böhlen & Gamper, "Approximate
  * matching of hierarchical data using pq-grams", VLDB 2005) — the
  * standard SCALABLE approximation of tree edit distance: where the
  * reference's ZSS kernel (zss/compare.py `simple_distance`) is O(n²)
  * per pair, the pq-gram profile is computed ONCE per tree in O(n) and
  * pairs compare in O(profile) by bag intersection, so trees can be
  * blocked/joined wholesale before the exact DP is spent on survivors.
  * This is the tree analogue of the shingle/MinHash machinery the
  * pipeline already applies to token streams — but structure-aware: a
  * pq-gram is a tiny subtree pattern (the anchor node, its p−1
  * ancestors, and q consecutive children), so moving a subtree disturbs
  * only the grams that touch it.
  *
  * Definitions (p = 2, q = 3 defaults, the paper's choice):
  *  - the EXTENDED tree pads p−1 `*` ancestors above the root, q−1 `*`
  *    before and after every non-leaf's children, and gives each leaf
  *    q `*` children;
  *  - one gram per anchor node per q-window of its extended children:
  *    label-tuple (anc_{p−1}, …, anc_1, anchor, c_i, …, c_{i+q−1});
  *    a leaf contributes exactly 1 gram, a k-child node k+q−1;
  *  - the profile is the BAG of gram tuples; distance(T1,T2) =
  *    1 − 2·|P1 ⊓ P2| / (|P1| + |P2|) ∈ [0,1] (0 ⟺ equal profiles).
  *
  * Tuples are serialized with `\u0001` between labels and `\u0002` as
  * the `*` pad (both outside every lexer alphabet here — a literal `*`
  * TOKEN therefore cannot collide with padding), so the DuckDB oracle
  * re-derives the same strings with chr(1)/chr(2).
  *
  * Scale shape: profiles are a NARROW per-row map over the parsed tree
  * arrays (no shuffle, no DP); the exploded (id, gram, cnt) table
  * shuffles once by gram-join key during pair scoring, and both sides
  * of the pair join arrive through the same capped candidate generator
  * as every other comparator. Children enumeration is O(n) total via
  * the postorder/lmd identity (the subtree of j is [lmd(j), j], so the
  * children of j are found by k := j−1, then k := lmd(k)−1 while
  * k ≥ lmd(j) — right-to-left, no parent pointers needed).
  */
object PqGrams {

  val Sep = '\u0001'
  val Pad = "\u0002"
  val P = 2
  val Q = 3

  /** Pure per-tree gram bag (serialized tuples, unsorted). */
  def gramsOf(labels: Array[String], lmds: Array[Int],
              p: Int = P, q: Int = Q): Array[String] = {
    val n = labels.length
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    if (n == 0) return out.toArray
    // children (left-to-right) per node via the lmd identity
    val children = Array.fill(n)(List.empty[Int])
    var j = 0
    while (j < n) {
      var k = j - 1
      var acc = List.empty[Int]
      while (k >= lmds(j)) { acc = k :: acc; k = lmds(k) - 1 }
      children(j) = acc // left-to-right (built by prepending right-to-left)
      j += 1
    }
    val parent = Array.fill(n)(-1)
    var v = 0
    while (v < n) { children(v).foreach(c => parent(c) = v); v += 1 }
    // stem(i) = p−1 ancestors (farthest first) then the anchor, padded
    // with * above the root
    def stem(i: Int): List[String] = {
      var anc = List(labels(i))
      var cur = parent(i)
      var need = p - 1
      while (need > 0) {
        anc = (if (cur >= 0) labels(cur) else Pad) :: anc
        cur = if (cur >= 0) parent(cur) else -1
        need -= 1
      }
      anc
    }
    var a = 0
    while (a < n) {
      val st = stem(a)
      val kids = children(a).map(labels)
      val ext: List[String] =
        if (kids.isEmpty) List.fill(q)(Pad)
        else List.fill(q - 1)(Pad) ::: kids ::: List.fill(q - 1)(Pad)
      val extArr = ext.toArray
      var w = 0
      while (w + q <= extArr.length) {
        val gram = (st ++ extArr.slice(w, w + q)).mkString(Sep.toString)
        out += gram
        w += 1
      }
      a += 1
    }
    out.toArray
  }

  /** Exploded profile table (id, gram, cnt) + per-id bag size — the
    * join-ready relational form. */
  def profiles(trees: Dataset[TreeRow], p: Int = P, q: Int = Q): DataFrame = {
    val spark = trees.sparkSession
    import spark.implicits._
    trees.map(t => (t.id, gramsOf(t.labels, t.lmds, p, q)))
      .toDF("id", "grams")
      .select(col("id"), explode(col("grams")).as("gram"))
      .groupBy(col("id"), col("gram")).agg(count(lit(1)).as("cnt"))
  }

  /** STRUCTURE-aware blocking channel: (key, id) block-index rows from
    * banded MinHash over each tree's pq-gram set, scoped by lang (the
    * structural twin of [[Blocking.keyedIds]]'s token-shingle channel —
    * same band algebra, different evidence: token MinHash keys see
    * content n-grams, these keys see subtree patterns, so files whose
    * token stream mutated but whose SHAPE survived still collide).
    * Feed through [[CandidateGen.pairsFromKeys]] like every channel. */
  def blockKeys(trees: Dataset[TreeRow],
                mh: ParseStage.MinHashConfig = ParseStage.MinHashConfig(),
                p: Int = P, q: Int = Q): DataFrame = {
    import trees.sparkSession.implicits._
    import graft.util.Hashing
    trees.flatMap { t =>
      val grams = gramsOf(t.labels, t.lmds, p, q)
      val el = grams.map(g => Hashing.hashString(g, 0x7071L)).distinct
      // the shared seeded-minimum loop ([[Hashing.minSig]]) with the
      // pq-gram channel's own seed family
      val sig = Hashing.minSig(el, mh.numHashes,
        (e, s) => Hashing.mix64(e ^ Hashing.hashLong(s.toLong, 0x5047L)))
      val langH = Hashing.hashString(t.lang)
      (0 until mh.bands).map { band =>
        val init = Hashing.mix64(langH ^ Hashing.hashLong(band.toLong, 41L))
        (Hashing.foldBand(init, sig, band, mh.rows), t.id)
      }
    }.toDF("key", "id")
  }

  /** pq-gram distance per candidate pair. `pairs`: (idA, idB);
    * `prof`: output of [[profiles]]. Returns (idA, idB, inter, sizeA,
    * sizeB, pq_dist) with pq_dist rounded to 6 dp (cross-engine float
    * stability; the bag algebra itself is exact integers). */
  def pairDistances(pairs: DataFrame, prof: DataFrame): DataFrame = {
    val sizes = prof.groupBy(col("id")).agg(sum(col("cnt")).as("size"))
    val inter = pairs
      .join(prof.select(col("id").as("idA"), col("gram"), col("cnt").as("cA")), "idA")
      .join(prof.select(col("id").as("idB"), col("gram"), col("cnt").as("cB")),
        Seq("idB", "gram"))
      .groupBy(col("idA"), col("idB"))
      .agg(sum(least(col("cA"), col("cB"))).as("inter"))
    pairs
      .join(inter, Seq("idA", "idB"), "left")
      .na.fill(0L, Seq("inter"))
      .join(sizes.select(col("id").as("idA"), col("size").as("sizeA")), "idA")
      .join(sizes.select(col("id").as("idB"), col("size").as("sizeB")), "idB")
      .select(col("idA"), col("idB"), col("inter"), col("sizeA"), col("sizeB"),
        round(lit(1.0) - lit(2.0) * col("inter") / (col("sizeA") + col("sizeB")), 6)
          .as("pq_dist"))
  }
}

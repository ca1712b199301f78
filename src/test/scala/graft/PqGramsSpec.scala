package graft

import graft.operators.PqGrams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** pq-grams (Augsten et al. VLDB'05):
  *  - hand-enumerated profile + distance on paper-style examples;
  *  - a structural DIFFERENTIAL: grams computed from the flattened
  *    (labels, lmds) arrays must equal grams computed by a direct
  *    recursive walk over an explicit nested tree — two independent
  *    data paths (the lmd-based children reconstruction vs real child
  *    pointers) over randomly generated trees;
  *  - profile-size law and metric-ish invariants;
  *  - corpus sanity: matched pairs' pq_dist strictly below non-matched
  *    scored pairs' on average (the blocking-value claim).
  */
class PqGramsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val S = PqGrams.Sep.toString
  private val X = PqGrams.Pad

  // --- independent nested-tree implementation -------------------------
  private case class N(label: String, kids: List[N] = Nil)

  private def gramsNested(root: N, p: Int, q: Int): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(node: N, ancs: List[String]): Unit = {
      val stem = (List.fill(math.max(0, p - 1 - ancs.length))(X) ++
        ancs.takeRight(p - 1)) :+ node.label
      val kids = node.kids.map(_.label)
      val ext =
        if (kids.isEmpty) List.fill(q)(X)
        else List.fill(q - 1)(X) ++ kids ++ List.fill(q - 1)(X)
      for (w <- 0 to ext.length - q)
        out += (stem ++ ext.slice(w, w + q)).mkString(S)
      node.kids.foreach(walk(_, ancs :+ node.label))
    }
    walk(root, Nil)
    out.toSeq
  }

  /** Postorder flatten: (labels, lmds). */
  private def flatten(root: N): (Array[String], Array[Int]) = {
    val labels = scala.collection.mutable.ArrayBuffer.empty[String]
    val lmds = scala.collection.mutable.ArrayBuffer.empty[Int]
    def post(n: N): Int = { // returns lmd index of n
      var lmd = -1
      for (k <- n.kids) {
        val kl = post(k)
        if (lmd < 0) lmd = kl
      }
      if (lmd < 0) lmd = labels.length
      labels += n.label
      lmds += lmd
      lmd
    }
    post(root)
    (labels.toArray, lmds.toArray)
  }

  private def bag(xs: Seq[String]): Map[String, Int] =
    xs.groupBy(identity).map { case (k, v) => k -> v.size }

  test("hand example: a(b, c(d)) profile enumerated exactly") {
    val t = N("a", List(N("b"), N("c", List(N("d")))))
    val (labels, lmds) = flatten(t)
    assert(labels.toSeq === Seq("b", "d", "c", "a") && lmds.toSeq === Seq(0, 1, 1, 0))
    val got = bag(PqGrams.gramsOf(labels, lmds).toSeq)
    val want = bag(Seq(
      Seq("a", "b", X, X, X), // leaf b
      Seq("c", "d", X, X, X), // leaf d
      Seq("a", "c", X, X, "d"), Seq("a", "c", X, "d", X), Seq("a", "c", "d", X, X),
      Seq(X, "a", X, X, "b"), Seq(X, "a", X, "b", "c"),
      Seq(X, "a", "b", "c", X), Seq(X, "a", "c", X, X)
    ).map(_.mkString(S)))
    assert(got === want)
  }

  test("hand distance: one leaf relabeled -> 4/9") {
    val t1 = N("a", List(N("b"), N("c", List(N("d")))))
    val t2 = N("a", List(N("b"), N("c", List(N("e")))))
    val (l1, m1) = flatten(t1); val (l2, m2) = flatten(t2)
    val b1 = bag(PqGrams.gramsOf(l1, m1).toSeq)
    val b2 = bag(PqGrams.gramsOf(l2, m2).toSeq)
    val inter = b1.keySet.intersect(b2.keySet).toSeq
      .map(k => math.min(b1(k), b2(k))).sum
    val dist = 1.0 - 2.0 * inter / (b1.values.sum + b2.values.sum)
    assert(inter === 5)
    assert(math.abs(dist - 4.0 / 9.0) < 1e-12)
  }

  test("differential: lmd-array grams == nested-walk grams on random trees") {
    val rng = new graft.util.Hashing.DetRng(97L)
    def randTree(depth: Int): N = {
      val label = s"L${rng.nextInt(6)}"
      val nk = if (depth >= 4) 0 else rng.nextInt(4)
      N(label, List.fill(nk)(randTree(depth + 1)))
    }
    for (_ <- 1 to 60) {
      val t = randTree(0)
      val (labels, lmds) = flatten(t)
      assert(bag(PqGrams.gramsOf(labels, lmds).toSeq) === bag(gramsNested(t, 2, 3)),
        s"profile mismatch on ${labels.mkString(",")} / ${lmds.mkString(",")}")
      // and for a non-default (p, q) too
      assert(bag(PqGrams.gramsOf(labels, lmds, p = 3, q = 2).toSeq) ===
        bag(gramsNested(t, 3, 2)))
    }
  }

  test("profile-size law: leaves 1, k-child anchors k+q-1") {
    val rng = new graft.util.Hashing.DetRng(13L)
    def randTree(depth: Int): N = {
      val nk = if (depth >= 3) 0 else rng.nextInt(5)
      N(s"L${rng.nextInt(4)}", List.fill(nk)(randTree(depth + 1)))
    }
    for (_ <- 1 to 20) {
      val t = randTree(0)
      val (labels, lmds) = flatten(t)
      def count(n: N): Int =
        (if (n.kids.isEmpty) 1 else n.kids.size + PqGrams.Q - 1) + n.kids.map(count).sum
      assert(PqGrams.gramsOf(labels, lmds).length === count(t))
    }
  }

  test("identical trees distance 0; label-disjoint trees distance 1") {
    val t1 = N("a", List(N("b"), N("c")))
    val t1b = N("a", List(N("b"), N("c"))) // separately constructed twin
    val t2 = N("x", List(N("y"), N("z")))
    val (l1, m1) = flatten(t1); val (l1b, m1b) = flatten(t1b)
    val (l2, m2) = flatten(t2)
    val b1 = bag(PqGrams.gramsOf(l1, m1).toSeq)
    val b1b = bag(PqGrams.gramsOf(l1b, m1b).toSeq)
    val b2 = bag(PqGrams.gramsOf(l2, m2).toSeq)
    assert(b1 === b1b) // equal profiles -> distance 0
    assert(b1.keySet.intersect(b2.keySet).isEmpty) // inter 0 -> distance 1
  }

  test("structure blocking channel: full truth recall through the capped generator") {
    val s = spark
    val r = Pipeline.run(s, graft.sources.CorpusGen.corpus(s, "/root/testdata/sf0.001"))
    val cand = graft.operators.CandidateGen.pairsFromKeys(
      PqGrams.blockKeys(r.trees), Pipeline.Config().blocking.maxBlockSize)
    val t = r.trees.toDF().select(col("id"), col("groupId"))
    val truth = t.select(col("id").as("idA"), col("groupId"))
      .join(t.select(col("id").as("idB"), col("groupId")), "groupId")
      .where(col("idA") < col("idB"))
      .select(col("idA"), col("idB"))
    val captured = truth.join(cand, Seq("idA", "idB")).count()
    assert(captured === truth.count(),
      "every same-group pair must share a pq-gram band key at sf0.001")
    // determinism: the channel is a pure function of the trees
    assert(cand.count() ===
      graft.operators.CandidateGen.pairsFromKeys(
        PqGrams.blockKeys(r.trees), Pipeline.Config().blocking.maxBlockSize).count())
  }

  test("prefilter tradeoff: full truth recall while most DP cells are pruned") {
    val s = spark
    val row = ErQueries.queries("er_pqgram_tradeoff")(s, "/root/testdata/sf0.001")
      .where(col("tau") === 0.2).head()
    // at τ_pq = 0.20 on the structure channel's candidates: every true
    // duplicate survives, while ~3/4 of the candidate pairs (and ~4/5
    // of the would-be O(n²) DP cells) are pruned before the kernel runs
    assert(row.getAs[Double]("truth_recall") === 1.0)
    assert(row.getAs[Double]("frac_kept") < 0.3,
      s"expected most candidates pruned, got ${row.getAs[Double]("frac_kept")}")
    assert(row.getAs[Double]("frac_dp_cells") < 0.25,
      s"expected most DP cells pruned, got ${row.getAs[Double]("frac_dp_cells")}")
  }

  test("corpus: matched pairs sit far below cross-group pairs") {
    val s = spark
    val r = Pipeline.run(s, graft.sources.CorpusGen.corpus(s, "/root/testdata/sf0.001"))
    val prof = PqGrams.profiles(r.trees)
    // positives: the pipeline's matched pairs (at sf0.001 every scored
    // candidate is a true match — F1 = 1.0 — so negatives must be built
    // explicitly); negatives: each tree paired with the 7th-next tree
    // by id order from a DIFFERENT truth group
    val pos = r.matches.select(col("idA"), col("idB"))
    val t = r.trees.toDF().select(col("id"), col("groupId"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("id"))
    val neg = t
      .withColumn("id2", lead(col("id"), 7).over(w))
      .withColumn("g2", lead(col("groupId"), 7).over(w))
      .where(col("id2").isNotNull && col("groupId") =!= col("g2"))
      .select(col("id").as("idA"), col("id2").as("idB"))
    val dPos = PqGrams.pairDistances(pos, prof).agg(avg(col("pq_dist"))).head().getDouble(0)
    val dNeg = PqGrams.pairDistances(neg, prof).agg(avg(col("pq_dist"))).head().getDouble(0)
    assert(dPos < 0.2, s"matches should have small pq_dist, got $dPos")
    assert(dPos < dNeg / 2,
      s"pq_dist must separate matches from cross-group pairs, got pos=$dPos neg=$dNeg")
  }
}

package graft

import graft.operators.ClusterEval
import org.scalatest.funsuite.AnyFunSuite

/** B-cubed + ARI: differential against the O(n²) textbook definitions
  * (per-record B³ averages, raw pair agreement counts), golden values,
  * and the degenerate-partition convention. */
class ClusterEvalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(assign: Map[String, String], truth: Map[String, String]) = {
    import spark.implicits._
    val a = assign.toSeq.toDF("id", "clusterId")
    val t = truth.toSeq.toDF("id", "truthId")
    ClusterEval.evaluate(a, t).collect().head
  }

  /** Per-record B³ and raw pair counts straight from the definitions. */
  private def brute(assign: Map[String, String], truth: Map[String, String]) = {
    val ids = assign.keys.toSeq.sorted
    val n = ids.size
    var a = 0L; var b = 0L; var idx = 0L
    for (i <- ids.indices; j <- (i + 1) until n) {
      val sameC = assign(ids(i)) == assign(ids(j))
      val sameT = truth(ids(i)) == truth(ids(j))
      if (sameC) a += 1
      if (sameT) b += 1
      if (sameC && sameT) idx += 1
    }
    val p = ids.map { i =>
      val cl = ids.filter(x => assign(x) == assign(i))
      cl.count(x => truth(x) == truth(i)).toDouble / cl.size
    }.sum / n
    val r = ids.map { i =>
      val tc = ids.filter(x => truth(x) == truth(i))
      tc.count(x => assign(x) == assign(i)).toDouble / tc.size
    }.sum / n
    val total = n.toLong * (n - 1) / 2
    val expected = a.toDouble * b / total
    val maxIdx = (a + b) / 2.0
    val ari = if (maxIdx == expected) 1.0 else (idx - expected) / (maxIdx - expected)
    (a, b, idx, p, r, 2 * p * r / (p + r), ari)
  }

  private def r6(x: Double) = math.round(x * 1e6) / 1e6

  test("differential vs the textbook O(n²) definitions on random labelings") {
    val rnd = new scala.util.Random(31)
    for (trial <- 0 until 6) {
      val ids = (0 until 40).map(i => f"x$i%02d")
      val assign = ids.map(i => i -> s"c${rnd.nextInt(7)}").toMap
      val truth = ids.map(i => i -> s"t${rnd.nextInt(6)}").toMap
      val row = run(assign, truth)
      val (a, b, idx, p, r, f, ari) = brute(assign, truth)
      assert(row.getAs[Long]("a_pairs") == a, s"trial $trial a")
      assert(row.getAs[Long]("b_pairs") == b, s"trial $trial b")
      assert(row.getAs[Long]("index_pairs") == idx, s"trial $trial idx")
      assert(row.getAs[Double]("b3_precision") == r6(p), s"trial $trial p")
      assert(row.getAs[Double]("b3_recall") == r6(r), s"trial $trial r")
      assert(row.getAs[Double]("b3_f1") == r6(f), s"trial $trial f1")
      assert(row.getAs[Double]("ari") == r6(ari), s"trial $trial ari")
    }
  }

  test("identical clusterings score 1.0 everywhere") {
    val m = (0 until 12).map(i => f"x$i%02d" -> s"c${i % 3}").toMap
    val row = run(m, m.map { case (k, v) => k -> v.replace('c', 't') })
    assert(row.getAs[Double]("b3_f1") == 1.0 && row.getAs[Double]("ari") == 1.0)
  }

  test("all-singleton prediction against grouped truth: precision 1, low recall") {
    val ids = (0 until 8).map(i => s"x$i")
    val assign = ids.map(i => i -> i).toMap // singletons
    val truth = ids.map(i => i -> "t0").toMap // one big truth cluster
    val row = run(assign, truth)
    assert(row.getAs[Double]("b3_precision") == 1.0)
    assert(row.getAs[Double]("b3_recall") == 0.125)
    assert(row.getAs[Long]("index_pairs") == 0L)
    assert(row.getAs[Double]("ari") == 0.0) // expected index is 0 too
  }

  test("both all-singletons: ARI = 1 by convention, not 0/0") {
    val ids = (0 until 5).map(i => s"x$i")
    val row = run(ids.map(i => i -> i).toMap, ids.map(i => i -> (i + "t")).toMap)
    assert(row.getAs[Double]("ari") == 1.0 && row.getAs[Double]("b3_f1") == 1.0)
  }

  // ---- V-measure ----

  private def runV(assign: Map[String, String], truth: Map[String, String]) = {
    import spark.implicits._
    ClusterEval.vMeasure(
      assign.toSeq.toDF("id", "clusterId"),
      truth.toSeq.toDF("id", "truthId")).collect().head
  }

  /** Homogeneity/completeness/V straight from the EMNLP'07 definitions
    * (entropies over explicit probability maps — no contingency-table
    * algebra shared with the operator). */
  private def bruteV(assign: Map[String, String], truth: Map[String, String]) = {
    val ids = assign.keys.toSeq
    val n = ids.size.toDouble
    def h(label: String => String): Double =
      -ids.groupBy(label).values.map(_.size / n).map(p => p * math.log(p)).sum
    def hCond(of: String => String, given: String => String): Double =
      -ids.groupBy(x => (given(x), of(x))).values.map { cell =>
        val pJoint = cell.size / n
        val pGiven = ids.count(x => given(x) == given(cell.head)) / n
        pJoint * math.log(pJoint / pGiven)
      }.sum
    val hT = h(truth); val hC = h(assign)
    val hom = if (hT == 0) 1.0 else 1.0 - hCond(truth, assign) / hT
    val com = if (hC == 0) 1.0 else 1.0 - hCond(assign, truth) / hC
    val v = if (hom + com == 0) 0.0 else 2 * hom * com / (hom + com)
    (hT, hC, hom, com, v)
  }

  test("v-measure differential vs the entropy definitions on random labelings") {
    val rnd = new scala.util.Random(37)
    for (trial <- 0 until 6) {
      val ids = (0 until 40).map(i => f"x$i%02d")
      val assign = ids.map(i => i -> s"c${rnd.nextInt(7)}").toMap
      val truth = ids.map(i => i -> s"t${rnd.nextInt(6)}").toMap
      val row = runV(assign, truth)
      val (hT, hC, hom, com, v) = bruteV(assign, truth)
      assert(row.getAs[Double]("h_truth") == r6(hT), s"trial $trial hT")
      assert(row.getAs[Double]("h_clusters") == r6(hC), s"trial $trial hC")
      assert(row.getAs[Double]("homogeneity") == r6(hom), s"trial $trial hom")
      assert(row.getAs[Double]("completeness") == r6(com), s"trial $trial com")
      assert(row.getAs[Double]("v_measure") == r6(v), s"trial $trial v")
    }
  }

  test("v-measure degenerate shapes: perfect, one-blob, singletons") {
    val ids = (0 until 12).map(i => f"x$i%02d")
    val truth = ids.map(i => i -> s"t${i.drop(1).toInt % 3}").toMap
    // identical partition: everything 1
    val perfect = runV(truth.map { case (k, v) => k -> v.replace('t', 'c') }, truth)
    assert(perfect.getAs[Double]("v_measure") == 1.0 &&
      perfect.getAs[Double]("homogeneity") == 1.0 &&
      perfect.getAs[Double]("completeness") == 1.0)
    // one blob: completeness 1 (every class inside the one cluster),
    // homogeneity 0 (clusters tell you nothing about the class)
    val blob = runV(ids.map(i => i -> "c0").toMap, truth)
    assert(blob.getAs[Double]("completeness") == 1.0 &&
      blob.getAs[Double]("homogeneity") == 0.0 &&
      blob.getAs[Double]("v_measure") == 0.0)
    // all singletons: homogeneity 1, completeness < 1
    val single = runV(ids.map(i => i -> i).toMap, truth)
    assert(single.getAs[Double]("homogeneity") == 1.0 &&
      single.getAs[Double]("completeness") < 1.0)
  }
}

package graft

import graft.operators.CenterClustering
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CENTER / MERGE-CENTER: the parallel-rounds operator must reproduce
  * the sequential weight-ordered edge scan EXACTLY — differential
  * against an in-memory sequential reference on random weighted graphs,
  * plus the structural edges (hub one-shot absorption, monotone-chain
  * alternating stars, tie determinism, duplicate/self/reversed edges,
  * isolated singletons) and the merge semantics with a no-merge
  * control. */
class CenterClusteringSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** The sequential contract, verbatim: canonical (src<dst, min-w)
    * edges scanned in (w, src, dst) order; U,U → smaller id centers;
    * C,U → assign; else no-op. Returns per-node scan state + cluster. */
  private def seqScan(edges: Seq[(String, String, Double)])
      : (Map[String, Char], Map[String, String]) = {
    val canon = edges.filter(e => e._1 != e._2)
      .map { case (a, b, w) => (if (a < b) (a, b) else (b, a), w) }
      .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).min) }
      .toSeq.sortBy { case ((a, b), w) => (w, a, b) }
    val st = scala.collection.mutable.Map.empty[String, Char].withDefaultValue('U')
    val cid = scala.collection.mutable.Map.empty[String, String]
    for (((a, b), _) <- canon) (st(a), st(b)) match {
      case ('U', 'U') => st(a) = 'C'; cid(a) = a; st(b) = 'A'; cid(b) = a
      case ('C', 'U') => st(b) = 'A'; cid(b) = a
      case ('U', 'C') => st(a) = 'A'; cid(a) = b
      case _          => ()
    }
    (st.toMap.withDefaultValue('U'), cid.toMap)
  }

  private def sequentialCenter(nodes: Seq[String],
                               edges: Seq[(String, String, Double)])
      : Map[String, (String, Int)] = {
    val (st, cid) = seqScan(edges)
    nodes.map { v =>
      v -> (if (st(v) == 'A') (cid(v), 0) else (v, 1))
    }.toMap
  }

  /** Sequential MERGE-CENTER reference: union-find over CENTER cluster
    * ids, merging along every canonical edge with a SCAN-TIME-center
    * endpoint (state 'C' — end-of-scan U singletons do not merge) and
    * differing clusters; representative = min cluster id. */
  private def sequentialMergeCenter(nodes: Seq[String],
                                    edges: Seq[(String, String, Double)])
      : Map[String, String] = {
    val (st, cid) = seqScan(edges)
    def cluster(v: String) = if (st(v) == 'A') cid(v) else v
    val parent = scala.collection.mutable.Map(
      nodes.map(cluster).distinct.map(c => c -> c): _*)
    def find(x: String): String = {
      var r = x; while (parent(r) != r) r = parent(r); r
    }
    val canon = edges.filter(e => e._1 != e._2)
      .map { case (a, b, _) => if (a < b) (a, b) else (b, a) }.distinct
    for ((a, b) <- canon) {
      val (ca, cb) = (cluster(a), cluster(b))
      if ((st(a) == 'C' || st(b) == 'C') && ca != cb) {
        val (ra, rb) = (find(ca), find(cb))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
    }
    val byRoot = parent.keys.toSeq.groupBy(find)
    val rep = byRoot.flatMap { case (_, cs) => val mn = cs.min; cs.map(_ -> mn) }
    nodes.map(v => v -> rep(cluster(v))).toMap
  }

  private def run(nodes: Seq[String], edges: Seq[(String, String, Double)])
      : Map[String, (String, Int)] = {
    val s = spark; import s.implicits._
    val df = CenterClustering.cluster(
      edges.toDF("src", "dst", "w"), nodes.toDF("id"))
    df.collect().map(r =>
      r.getString(0) -> (r.getString(1), r.getInt(2))).toMap
  }

  test("differential vs the sequential scan on random weighted graphs") {
    val rng = new scala.util.Random(71)
    for (trial <- 1 to 12) {
      val n = 6 + rng.nextInt(36)
      val nodes = (0 until n).map(i => f"c$trial%02d_$i%02d")
      val edges = for {
        i <- 0 until n; j <- (i + 1) until n
        if rng.nextDouble() < 0.12
      } yield (nodes(i), nodes(j), math.floor(rng.nextDouble() * 20) / 20.0)
      assert(run(nodes, edges) == sequentialCenter(nodes, edges),
        s"trial $trial")
    }
  }

  test("merge-center differential vs the sequential reference") {
    val s = spark; import s.implicits._
    val rng = new scala.util.Random(97)
    for (trial <- 1 to 8) {
      val n = 6 + rng.nextInt(28)
      val nodes = (0 until n).map(i => f"m$trial%02d_$i%02d")
      val edges = for {
        i <- 0 until n; j <- (i + 1) until n
        if rng.nextDouble() < 0.14
      } yield (nodes(i), nodes(j), math.floor(rng.nextDouble() * 20) / 20.0)
      val e = edges.toDF("src", "dst", "w")
      val assign = CenterClustering.cluster(e, nodes.toDF("id"))
      val got = CenterClustering.mergeCenter(e, assign)
        .collect().map(r => r.getString(0) -> r.getString(2)).toMap
      assert(got == sequentialMergeCenter(nodes, edges), s"trial $trial")
    }
  }

  test("hub: the center absorbs every spoke, in O(1) rounds not O(degree)") {
    val s = spark; import s.implicits._
    val hub = "a00"
    val spokes = (1 to 30).map(i => f"a$i%02d")
    // hub edge weights increase with the spoke index — sequentially the
    // first edge centers the hub, then every later edge is C,U
    val edges = spokes.zipWithIndex.map { case (sp, i) => (hub, sp, i / 100.0) }
    val df = CenterClustering.cluster(edges.toDF("src", "dst", "w"),
      (hub +: spokes).toDF("id"))
    val rows = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3)))
    assert(rows.forall(_._2 == hub))
    assert(rows.filter(_._1 != hub).forall(_._3 == 0))
    // one round decides the hub + first spoke, one more sweeps the rest
    assert(rows.map(_._4).max <= 2, s"rounds: ${rows.map(_._4).max}")
  }

  test("monotone chain: alternating stars, the sequential worst case") {
    val s = spark; import s.implicits._
    val vs = (0 until 9).map(i => f"p$i%d")
    val edges = (0 until 8).map(i => (vs(i), vs(i + 1), i / 10.0))
    val got = run(vs, edges.map(e => (e._1, e._2, e._3)))
    // scan: (p0,p1) centers p0; (p1,p2) no-op (p1 is A); (p2,p3)
    // centers p2; ... p8 pairs with p7's no-op then stays U → singleton
    val want = Map(
      "p0" -> ("p0", 1), "p1" -> ("p0", 0), "p2" -> ("p2", 1),
      "p3" -> ("p2", 0), "p4" -> ("p4", 1), "p5" -> ("p4", 0),
      "p6" -> ("p6", 1), "p7" -> ("p6", 0), "p8" -> ("p8", 1))
    assert(got == want)
  }

  test("ties break on (src, dst); duplicates, reversed and self edges collapse") {
    val nodes = Seq("x1", "x2", "x3")
    // all weights equal: (x1,x2) scans before (x1,x3) and (x2,x3) —
    // x1 centers x2; then (x1,x3): C,U assigns x3; reversed duplicate
    // of (x1,x2) at a HIGHER weight must not add a second scan position
    val edges = Seq(("x2", "x1", 0.5), ("x1", "x3", 0.5), ("x2", "x3", 0.5),
      ("x1", "x2", 0.9), ("x3", "x3", 0.1))
    val got = run(nodes, edges)
    assert(got == Map("x1" -> ("x1", 1), "x2" -> ("x1", 0), "x3" -> ("x1", 0)))
  }

  test("merge through a shared-center record; A-A contact is a no-merge control") {
    val s = spark; import s.implicits._
    // two stars (smaller id centers the U,U edge): c1{c1,m1}, c2{c2,m2};
    // bridge edge m1–c2 (record m1 similar to center c2 → merge);
    // control edge m1–m2 alone must NOT merge (no center endpoint)
    val nodes = Seq("c1", "m1", "c2", "m2")
    val base = Seq(("c1", "m1", 0.1), ("c2", "m2", 0.2))
    def mc(extra: Seq[(String, String, Double)]): Map[String, String] = {
      val e = (base ++ extra).toDF("src", "dst", "w")
      val assign = CenterClustering.cluster(e, nodes.toDF("id"))
      CenterClustering.mergeCenter(e, assign)
        .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    }
    val merged = mc(Seq(("m1", "c2", 0.9)))
    assert(merged.values.toSet == Set("c1"))
    val control = mc(Seq(("m1", "m2", 0.9)))
    assert(control == Map("c1" -> "c1", "m1" -> "c1", "c2" -> "c2", "m2" -> "c2"))
  }

  test("no edges: every node is its own singleton center") {
    val s = spark; import s.implicits._
    val nodes = Seq("s1", "s2", "s3")
    val df = CenterClustering.cluster(
      Seq.empty[(String, String, Double)].toDF("src", "dst", "w"),
      nodes.toDF("id"))
    val got = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3))).toSet
    assert(got == nodes.map(v => (v, v, 1, 0)).toSet)
  }

  test("invariants on random graphs: A maps to a C, C and U map to self") {
    val rng = new scala.util.Random(13)
    val n = 40
    val nodes = (0 until n).map(i => f"i$i%02d")
    val edges = for {
      i <- 0 until n; j <- (i + 1) until n
      if rng.nextDouble() < 0.1
    } yield (nodes(i), nodes(j), rng.nextDouble())
    val got = run(nodes, edges)
    val centers = got.collect { case (v, (c, 1)) => v }.toSet
    got.foreach { case (v, (c, ic)) =>
      if (ic == 1) assert(c == v) else assert(centers.contains(c), s"$v -> $c")
    }
  }
}

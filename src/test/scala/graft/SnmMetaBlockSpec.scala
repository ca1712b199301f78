package graft

import graft.operators.{MetaBlocking, SortedNeighborhood}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sorted-neighborhood blocking + meta-blocking unit coverage: exact
  * pair sets vs brute force, partition-count invariance of the
  * distributed rank, the bounded-tile plan shape, CBS weight semantics,
  * and the integer-exact WNP kept rule. */
class SnmMetaBlockSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // ---------------- sorted neighborhood ----------------

  private def bruteSnm(rows: Seq[(String, Int)], w: Int): Set[(String, String)] = {
    val order = rows.sortBy { case (id, k) => (k, id) }.map(_._1)
    (for {
      i <- order.indices
      j <- (i + 1) until math.min(i + w, order.length)
      a = order(i); b = order(j)
    } yield (if (a < b) (a, b) else (b, a))).toSet
  }

  private def snmPairs(rows: Seq[(String, Int)], w: Int, parts: Int): Set[(String, String)] = {
    import spark.implicits._
    SortedNeighborhood.pairs(rows.toDF("id", "k"), "id", Seq("k", "id"), w, parts)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
  }

  private val rnd = new scala.util.Random(7)
  private val sample: Seq[(String, Int)] =
    (0 until 60).map(i => (f"id$i%03d", rnd.nextInt(12)))

  test("SNM pairs == brute-force window pairs (ties broken by id)") {
    for (w <- Seq(2, 3, 8)) {
      assert(snmPairs(sample, w, parts = 4) == bruteSnm(sample, w), s"window $w")
    }
  }

  test("SNM pair set is invariant to the partition count") {
    val expected = bruteSnm(sample, 5)
    for (parts <- Seq(1, 3, 16)) {
      assert(snmPairs(sample, 5, parts) == expected, s"parts $parts")
    }
  }

  test("global rank is exact, 1-based, and gap-free across range partitions") {
    import spark.implicits._
    val df = sample.toDF("id", "k")
    val ranked = SortedNeighborhood.withGlobalRank(df, Seq("k", "id"), parts = 5)
      .select(col("id"), col("rank")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val order = sample.sortBy { case (id, k) => (k, id) }.map(_._1)
    order.zipWithIndex.foreach { case (id, i) =>
      assert(ranked(id) == i + 1, s"rank of $id")
    }
  }

  test("rank plan has no single-partition global sort: the window runs per range partition") {
    import spark.implicits._
    val (lazyRanked, ordered) = SortedNeighborhood
      .rankedLazy(sample.toDF("id", "k"), Seq("k", "id"), parts = 5)
    val plan = lazyRanked.queryExecution.executedPlan.toString
    ordered.unpersist(false)
    // the row_number window must be partitioned (by pid), never a global
    // empty-partition-spec window (which would serialize on one task)
    assert(plan.contains("row_number"))
    assert(!plan.matches("(?s).*windowspecdefinition\\(k.*"), "window must partition by pid")
    assert(plan.contains("hashpartitioning(pid"), "rank window should hash by pid")
  }

  test("empty input yields no pairs and no ranks") {
    import spark.implicits._
    val empty = Seq.empty[(String, Int)].toDF("id", "k")
    assert(SortedNeighborhood.pairs(empty, "id", Seq("k", "id"), 4, 3).count() == 0)
  }

  // ---------------- meta-blocking ----------------

  test("CBS weight = number of shared capped blocks") {
    import spark.implicits._
    val keyed = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "b"),
      (4L, "c"), (4L, "d")
    ).toDF("key", "id")
    val w = MetaBlocking.pairWeights(keyed, cap = 64)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(w(("a", "b")) == 3L)
    assert(w(("a", "c")) == 1L)
    assert(w(("b", "c")) == 1L)
    assert(w(("c", "d")) == 1L)
    assert(w.size == 4)
  }

  test("duplicate (key,id) rows do not inflate weights (set semantics)") {
    import spark.implicits._
    val keyed = Seq((1L, "a"), (1L, "a"), (1L, "b"), (1L, "b")).toDF("key", "id")
    val w = MetaBlocking.pairWeights(keyed, cap = 64).collect()
    assert(w.length == 1 && w.head.getLong(2) == 1L)
  }

  test("cap keeps the lowest ids before pairs exist") {
    import spark.implicits._
    val keyed = (1 to 10).map(i => (9L, f"id$i%02d")).toDF("key", "id")
    val w = MetaBlocking.pairWeights(keyed, cap = 3).collect()
    val members = w.flatMap(r => Seq(r.getString(0), r.getString(1))).toSet
    assert(members == Set("id01", "id02", "id03"))
    assert(w.length == 3) // C(3,2)
  }

  test("WNP kept rule: weight reaches either endpoint's mean (integer-exact)") {
    import spark.implicits._
    // node a has pairs of weight 3 and 1 (mean 2): (a,b,3) kept, (a,c,1)
    // kept only if c's own mean allows; c has only that pair (mean 1) so
    // OR-semantics keeps it
    val weights = Seq(("a", "b", 3L), ("a", "c", 1L)).toDF("idA", "idB", "weight")
    val kept = MetaBlocking.prune(weights)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getBoolean(3))).toMap
    assert(kept(("a", "b")))
    assert(kept(("a", "c"))) // c's mean is 1 → kept by the OR
  }

  test("plan lock: weight agg + pruning never plan a cartesian or nested loop") {
    import spark.implicits._
    val keyed = (0 until 30).flatMap(i => Seq((i.toLong % 5, s"id$i"), (7L, s"id$i")))
      .toDF("key", "id")
    val plan = MetaBlocking.prune(MetaBlocking.pairWeights(keyed, cap = 8))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("WNP prunes a pair below BOTH endpoints' means") {
    import spark.implicits._
    val weights = Seq(
      ("a", "b", 5L), ("a", "c", 1L),
      ("c", "d", 5L)).toDF("idA", "idB", "weight")
    // a's mean = 3, c's mean = 3 → (a,c,1) fails both
    val kept = MetaBlocking.prune(weights)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getBoolean(3))).toMap
    assert(kept(("a", "b")))
    assert(kept(("c", "d")))
    assert(!kept(("a", "c")))
  }
}

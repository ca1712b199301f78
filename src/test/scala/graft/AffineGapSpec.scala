package graft

import graft.functions.{AffineGapFn, AffineGapKernel}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Gotoh affine-gap distance: brute-force differential against an
  * INDEPENDENT alignment-enumeration reference (every increasing
  * matching costed as sub-mismatches + Open+Ext·len per maximal
  * unmatched run), degenerate-parameter equality with Spark's own
  * levenshtein, identities, gap-coalescing behavior, matrix/rolling-row
  * agreement with border encoding, and the codegen + SQL surfaces. */
class AffineGapSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def u(s: String) = UTF8String.fromString(s)
  private def ag(a: String, b: String): Int =
    AffineGapKernel.distance(u(a), u(b))

  /** Independent reference: enumerate ALL increasing matchings between
    * positions of a and b; a matching costs Sub per mismatched aligned
    * pair plus Open + Ext·len for each maximal run of consecutive
    * unmatched positions in either string. The optimal alignment is
    * the cheapest matching — the textbook semantics the DP optimizes,
    * derived here without any DP. */
  private def brute(a: String, b: String,
                    open: Int = AffineGapKernel.GapOpen,
                    ext: Int = AffineGapKernel.GapExt,
                    sub: Int = AffineGapKernel.SubCost): Int = {
    val la = a.length; val lb = b.length
    def enum(i: Int, j: Int): Seq[List[(Int, Int)]] =
      if (i == la) Seq(Nil)
      else enum(i + 1, j) ++
        (j until lb).flatMap(j2 => enum(i + 1, j2 + 1).map((i, j2) :: _))
    def runCost(unmatched: Seq[Int]): Int = {
      if (unmatched.isEmpty) 0
      else {
        var runs = 1
        var len = unmatched.length
        var k = 1
        while (k < unmatched.length) {
          if (unmatched(k) != unmatched(k - 1) + 1) runs += 1
          k += 1
        }
        runs * open + len * ext
      }
    }
    enum(0, 0).map { m =>
      val subCost = m.map { case (i, j) => if (a(i) == b(j)) 0 else sub }.sum
      val ma = m.map(_._1).toSet; val mb = m.map(_._2).toSet
      subCost +
        runCost((0 until la).filterNot(ma)) +
        runCost((0 until lb).filterNot(mb))
    }.min
  }

  test("brute-force differential: DP == cheapest alignment on random short strings") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 250) {
      val a = Seq.fill(rng.nextInt(7))("abc" (rng.nextInt(3))).mkString
      val b = Seq.fill(rng.nextInt(7))("abc" (rng.nextInt(3))).mkString
      assert(ag(a, b) == brute(a, b), s"'$a' vs '$b'")
    }
  }

  test("Open=0, Ext=1, Sub=1 degenerates to plain Levenshtein") {
    val s = spark; import s.implicits._
    val rng = new scala.util.Random(13)
    val cases = Seq.fill(60)((
      Seq.fill(rng.nextInt(12))(('a' + rng.nextInt(5)).toChar).mkString,
      Seq.fill(rng.nextInt(12))(('a' + rng.nextInt(5)).toChar).mkString))
    val lev = cases.toDF("a", "b")
      .select(levenshtein(col("a"), col("b"))).as[Int].collect()
    cases.zip(lev).foreach { case ((a, b), l) =>
      assert(AffineGapKernel.distanceParam(u(a), u(b), 0, 1, 1) == l,
        s"'$a' vs '$b'")
    }
  }

  test("identities: self=0, symmetry, empty = Open + Ext*len, both-empty = 0") {
    import AffineGapKernel._
    assert(ag("", "") == 0)
    assert(ag("g1/m2.src", "g1/m2.src") == 0)
    assert(ag("", "abc") == GapOpen + 3 * GapExt)
    assert(ag("abcd", "") == GapOpen + 4 * GapExt)
    val rng = new scala.util.Random(3)
    for (_ <- 1 to 40) {
      val a = Seq.fill(rng.nextInt(10))(('a' + rng.nextInt(4)).toChar).mkString
      val b = Seq.fill(rng.nextInt(10))(('a' + rng.nextInt(4)).toChar).mkString
      assert(ag(a, b) == ag(b, a), s"'$a' vs '$b'")
    }
  }

  test("gap coalescing: one contiguous gap beats the same chars scattered") {
    import AffineGapKernel._
    // delete 4 contiguous chars: one gap
    assert(ag("abcdefgh", "abgh") == GapOpen + 4 * GapExt)
    // delete the same count scattered across two runs: two opens
    assert(ag("abcdefgh", "cdgh") == GapOpen + 2 * GapExt + GapOpen + 2 * GapExt)
    assert(ag("abcdefgh", "abgh") < ag("abcdefgh", "cdgh"))
    // truncation is cheap relative to per-char penalties: the
    // motivating "International Business Machines" shape
    assert(ag("business-machines", "machines") == GapOpen + 9 * GapExt)
  }

  test("matrix dump: corner == rolling-row distance; borders encode INF as -1") {
    val rng = new scala.util.Random(29)
    for (_ <- 1 to 25) {
      val a = Seq.fill(rng.nextInt(9))(('a' + rng.nextInt(4)).toChar).mkString
      val b = Seq.fill(rng.nextInt(9))(('a' + rng.nextInt(4)).toChar).mkString
      val m = AffineGapKernel.matrix(u(a), u(b))
        .map { case (i, j, d, p, q) => (i, j) -> (d, p, q) }.toMap
      assert(m.size == (a.length + 1) * (b.length + 1))
      assert(m((a.length, b.length))._1 == ag(a, b), s"'$a' vs '$b'")
      assert(m((0, 0)) == (0, -1, -1))
      for (i <- 1 to a.length)
        assert(m((i, 0)) == (AffineGapKernel.GapOpen + AffineGapKernel.GapExt * i,
          AffineGapKernel.GapOpen + AffineGapKernel.GapExt * i, -1))
      for (j <- 1 to b.length)
        assert(m((0, j)) == (AffineGapKernel.GapOpen + AffineGapKernel.GapExt * j, -1,
          AffineGapKernel.GapOpen + AffineGapKernel.GapExt * j))
    }
  }

  test("DataFrame surface: codegen'd, null-safe, inside WholeStageCodegen; SQL registry") {
    val s = spark; import s.implicits._
    AffineGapFn.register(spark)
    val df = Seq(
      (Option("kitten"), Option("sitting")),
      (None: Option[String], Option("x")),
      (Option("x"), None: Option[String]))
      .toDF("a", "b")
      // repartition keeps ConvertToLocalRelation from folding the whole
      // projection into a LocalTableScan — the plan lock below needs the
      // expression to actually run inside generated code
      .repartition(1)
      .select(AffineGapFn.affineGap(col("a"), col("b")).as("ag"))
    val rows = df.collect()
    // AQE finalizes the physical plan only on execution — read it after
    val plan = df.queryExecution.executedPlan.toString
    // AQE's final-plan rendering marks WholeStageCodegen stages with the
    // `*(n)` star rather than the literal node name
    assert("""\*\(\d+\) Project \[affinegap""".r.findFirstIn(plan).isDefined,
      s"expected the affine-gap projection inside a WholeStageCodegen stage:\n$plan")
    assert(rows(0).getInt(0) == ag("kitten", "sitting"))
    assert(rows(1).isNullAt(0) && rows(2).isNullAt(0))
    val viaSql = spark.sql("SELECT affine_gap('kitten', 'sitting') AS d")
      .collect()(0).getInt(0)
    assert(viaSql == ag("kitten", "sitting"))
  }
}

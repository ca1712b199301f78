package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Smith–Waterman LOCAL alignment score (Smith & Waterman 1981,
  * "Identification of common molecular subsequences", JMB 147): the
  * best-scoring alignment between any SUBSTRING of `a` and any
  * substring of `b` — the record-linkage comparator for fields
  * embedded in longer strings ("dept. of computer science, stanford
  * university" vs "stanford univ.") where every GLOBAL comparator
  * (Levenshtein, Jaro, [[AffineGapKernel]] Gotoh) drowns the shared
  * core in end-gap noise. A standard comparator in the Febrl /
  * Magellan toolkits (Christen, "Data Matching", 2012, §5.4).
  *
  * Score model (all integer, cross-engine exact): match +[[MatchScore]],
  * mismatch −[[MismatchPenalty]], gap character −[[GapPenalty]], and the
  * defining zero floor — an alignment is abandoned rather than carried
  * at negative score:
  *   H[i][j] = max(0, H[i−1][j−1] + s(aᵢ, bⱼ),
  *                 H[i−1][j] − Gap, H[i][j−1] − Gap)
  * with H[i][0] = H[0][j] = 0, and the reported score = max over ALL
  * cells (not the corner — local, not global). Base cases + recurrence
  * determine every cell uniquely, which the er_smith_waterman oracle
  * exploits exactly like er_affine_gap: the engine dumps the full H
  * matrix and DuckDB re-checks every axiom — borders, the interior
  * recurrence cell-by-cell via three window passes, completeness, and
  * the matrix max as ITS score.
  *
  * Scale shape: a pure per-row scalar. O(|a|·|b|) time, O(|b|) space
  * (one rolling row + running max), whole-stage-codegen'd via
  * `defineCodeGen` so it fuses into the surrounding generated loop.
  */
object SmithWatermanKernel {

  /** Classic 2/−1/−1 scoring (match twice a gap, so one aligned pair
    * survives one flanking gap — the common default). Integer so
    * decisions and oracle compares are float-free. ONE definition; the
    * oracle SQL interpolates these. */
  val MatchScore = 2
  val MismatchPenalty = 1
  val GapPenalty = 1

  /** Rolling-row DP; returns max over all H cells (0 when nothing
    * aligns — e.g. disjoint alphabets or an empty side). */
  def score(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.getBytes; val b = ub.getBytes
    val la = a.length; val lb = b.length
    if (la == 0 || lb == 0) return 0
    val h = new Array[Int](lb + 1) // row i, h(0) stays 0 (border)
    var best = 0
    var i = 1
    while (i <= la) {
      var diag = 0 // H[i−1][0] (border)
      val ai = a(i - 1)
      var j = 1
      while (j <= lb) {
        val m = diag +
          (if (ai == b(j - 1)) MatchScore else -MismatchPenalty)
        diag = h(j)
        var v = m
        if (h(j) - GapPenalty > v) v = h(j) - GapPenalty     // gap in b
        if (h(j - 1) - GapPenalty > v) v = h(j - 1) - GapPenalty // gap in a
        if (v < 0) v = 0
        h(j) = v
        if (v > best) best = v
        j += 1
      }
      i += 1
    }
    best
  }

  /** Full-matrix variant for the oracle dump: every (i, j, H[i][j]).
    * Same recurrence as [[score]]; SmithWatermanSpec pins
    * max(matrix) == rolling-row score. */
  def matrix(ua: UTF8String, ub: UTF8String): Array[(Int, Int, Int)] = {
    val a = ua.getBytes; val b = ub.getBytes
    val la = a.length; val lb = b.length
    val h = Array.ofDim[Int](la + 1, lb + 1)
    var i = 1
    while (i <= la) {
      var j = 1
      while (j <= lb) {
        val m = h(i - 1)(j - 1) +
          (if (a(i - 1) == b(j - 1)) MatchScore else -MismatchPenalty)
        h(i)(j) = math.max(0, math.max(m,
          math.max(h(i - 1)(j) - GapPenalty, h(i)(j - 1) - GapPenalty)))
        j += 1
      }
      i += 1
    }
    val out = new Array[(Int, Int, Int)]((la + 1) * (lb + 1))
    var k = 0
    i = 0
    while (i <= la) {
      var j = 0
      while (j <= lb) { out(k) = (i, j, h(i)(j)); k += 1; j += 1 }
      i += 1
    }
    out
  }
}

case class SmithWaterman(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SmithWatermanKernel.score(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SmithWatermanKernel.score((org.apache.spark.unsafe.types.UTF8String) $a, (org.apache.spark.unsafe.types.UTF8String) $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SmithWatermanFn {

  def smithWaterman(a: Column, b: Column): Column =
    call_function("smith_waterman", a, b)

  /** Register `smith_waterman` for spark.sql(...) and the Column helper. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "smith_waterman",
      { exprs =>
        require(exprs.length == 2, "smith_waterman(a, b)")
        SmithWaterman(exprs(0), exprs(1))
      }, "scala_udf")
}

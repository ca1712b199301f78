package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Affine-gap global edit distance (Gotoh 1982, "An improved algorithm
  * for matching biological sequences", JMB 162; the record-linkage
  * comparator of Bilenko & Mooney KDD'03 — "affine gap distance"): a
  * gap of length L costs GapOpen + GapExt·L instead of L unit edits, so
  * one contiguous deletion ("International Business Machines" vs "IBM
  * Machines") is far cheaper than the same characters scattered —
  * exactly the truncation/abbreviation shape plain Levenshtein
  * over-penalizes in entity resolution.
  *
  * Cost model (all integer, so the value is cross-engine exact):
  * substitution 1 (0 on equal bytes), gap of length L = Open + Ext·L.
  * With Open=0, Ext=1 this degenerates to plain Levenshtein — a
  * property the spec pins against Spark's own `levenshtein`.
  *
  * Three-matrix recurrence over UTF-8 bytes (minimization form):
  *   P[i][j] = min(D[i−1][j] + Open + Ext, P[i−1][j] + Ext)   — gap in b
  *   Q[i][j] = min(D[i][j−1] + Open + Ext, Q[i][j−1] + Ext)   — gap in a
  *   D[i][j] = min(D[i−1][j−1] + sub(aᵢ, bⱼ), P[i][j], Q[i][j])
  * with D[0][0]=0, D[i][0]=P[i][0]=Open+Ext·i, D[0][j]=Q[0][j]=
  * Open+Ext·j, and the opposite-gap matrices pinned to INF on their
  * empty border (a P-state means the alignment ENDS in a gap in b,
  * impossible at j-borders of Q and vice versa). The base cases plus
  * the recurrence determine every cell uniquely, which is what the
  * er_affine_gap oracle exploits: the engine dumps all three matrices
  * and DuckDB re-checks EVERY axiom — borders, all three interior
  * recurrences cell-by-cell via neighbor self-joins, cell-count
  * completeness, and corner == the reported distance.
  *
  * Scale shape: a pure per-row scalar. O(|a|·|b|) time, O(|b|) space —
  * three rolling rows, no matrix — and whole-stage-codegen'd via
  * `defineCodeGen` (static call, like Spark's `levenshtein`), so it
  * fuses into the surrounding generated loop.
  */
object AffineGapKernel {

  /** Default penalties: opening a gap costs as much as 2 scattered
    * edits, extending it one third of one. Chosen integer so decisions
    * and oracle compares are float-free. */
  val GapOpen = 6
  val GapExt = 2
  val SubCost = 3
  /** A safe "impossible" sentinel: larger than any reachable cost
    * (max path ~ Open + Ext·(|a|+|b|) + Sub·min) yet far from Int
    * overflow when added to. */
  val Inf: Int = Int.MaxValue / 4

  /** Rolling-row Gotoh DP; returns D[|a|][|b|]. */
  def distance(ua: UTF8String, ub: UTF8String): Int =
    distanceParam(ua, ub, GapOpen, GapExt, SubCost)

  def distanceParam(ua: UTF8String, ub: UTF8String,
                    open: Int, ext: Int, sub: Int): Int = {
    val a = ua.getBytes; val b = ub.getBytes
    val la = a.length; val lb = b.length
    if (la == 0 && lb == 0) return 0
    if (la == 0) return open + ext * lb
    if (lb == 0) return open + ext * la
    val d = new Array[Int](lb + 1)   // D row i
    val p = new Array[Int](lb + 1)   // P row i
    val q = new Array[Int](lb + 1)   // Q row i
    d(0) = 0; p(0) = Inf; q(0) = Inf
    var j = 1
    while (j <= lb) { d(j) = open + ext * j; q(j) = d(j); p(j) = Inf; j += 1 }
    var i = 1
    while (i <= la) {
      var diag = d(0)                // D[i−1][0]
      d(0) = open + ext * i
      p(0) = d(0)
      q(0) = Inf
      val ai = a(i - 1)
      j = 1
      while (j <= lb) {
        val pj = math.min(
          (if (d(j) >= Inf) Inf else d(j) + open + ext),
          (if (p(j) >= Inf) Inf else p(j) + ext))
        val qj = math.min(
          (if (d(j - 1) >= Inf) Inf else d(j - 1) + open + ext),
          (if (q(j - 1) >= Inf) Inf else q(j - 1) + ext))
        val m = diag + (if (ai == b(j - 1)) 0 else sub)
        diag = d(j)
        d(j) = math.min(m, math.min(pj, qj))
        p(j) = pj; q(j) = qj
        j += 1
      }
      i += 1
    }
    d(lb)
  }

  /** Full-matrix variant for the oracle dump: returns every (i, j,
    * dcell, pcell, qcell) with INF encoded as −1 (SQL-friendly).
    * Same recurrence as [[distanceParam]]; the er_affine_gap oracle
    * re-checks each cell independently, and AffineGapSpec pins
    * matrix corner == rolling-row distance. */
  def matrix(ua: UTF8String, ub: UTF8String): Array[(Int, Int, Int, Int, Int)] = {
    val a = ua.getBytes; val b = ub.getBytes
    val la = a.length; val lb = b.length
    val d = Array.ofDim[Int](la + 1, lb + 1)
    val p = Array.ofDim[Int](la + 1, lb + 1)
    val q = Array.ofDim[Int](la + 1, lb + 1)
    d(0)(0) = 0; p(0)(0) = Inf; q(0)(0) = Inf
    var j = 1
    while (j <= lb) {
      d(0)(j) = GapOpen + GapExt * j; q(0)(j) = d(0)(j); p(0)(j) = Inf; j += 1
    }
    var i = 1
    while (i <= la) {
      d(i)(0) = GapOpen + GapExt * i; p(i)(0) = d(i)(0); q(i)(0) = Inf
      j = 1
      while (j <= lb) {
        val pj = math.min(
          (if (d(i - 1)(j) >= Inf) Inf else d(i - 1)(j) + GapOpen + GapExt),
          (if (p(i - 1)(j) >= Inf) Inf else p(i - 1)(j) + GapExt))
        val qj = math.min(
          (if (d(i)(j - 1) >= Inf) Inf else d(i)(j - 1) + GapOpen + GapExt),
          (if (q(i)(j - 1) >= Inf) Inf else q(i)(j - 1) + GapExt))
        val m = d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else SubCost)
        d(i)(j) = math.min(m, math.min(pj, qj))
        p(i)(j) = pj; q(i)(j) = qj
        j += 1
      }
      i += 1
    }
    val out = new Array[(Int, Int, Int, Int, Int)]((la + 1) * (lb + 1))
    var k = 0
    i = 0
    while (i <= la) {
      j = 0
      while (j <= lb) {
        def enc(v: Int) = if (v >= Inf) -1 else v
        out(k) = (i, j, enc(d(i)(j)), enc(p(i)(j)), enc(q(i)(j)))
        k += 1; j += 1
      }
      i += 1
    }
    out
  }
}

case class AffineGap(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    AffineGapKernel.distance(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.AffineGapKernel.distance((org.apache.spark.unsafe.types.UTF8String) $a, (org.apache.spark.unsafe.types.UTF8String) $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object AffineGapFn {

  def affineGap(a: Column, b: Column): Column =
    call_function("affine_gap", a, b)

  /** Register `affine_gap` for spark.sql(...) and the Column helper. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "affine_gap",
      { exprs =>
        require(exprs.length == 2, "affine_gap(a, b)")
        AffineGap(exprs(0), exprs(1))
      }, "scala_udf")
}

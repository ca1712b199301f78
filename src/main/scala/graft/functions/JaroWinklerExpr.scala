package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro and Jaro–Winkler string similarity (Jaro 1989; Winkler 1990) as
  * native Catalyst expressions — the classic field comparators of
  * probabilistic record linkage, feeding the same decision layer as the
  * Fellegi–Sunter model (name/address agreement in census linkage was
  * Winkler's original application).
  *
  * Semantics are pinned to the published algorithm exactly as DuckDB's
  * `jaro_winkler_similarity` implements it (probed empirically, see
  * JaroWinklerSpec's golden rows): match window `max(|a|,|b|)/2 - 1`
  * (floored at 0), transpositions = half the out-of-order matches,
  * Winkler boost `j + p·0.1·(1−j)` applied only when `j > 0.7` with
  * common prefix `p ≤ 4`, and `0.0` when EITHER side is empty (including
  * both-empty — DuckDB's convention, kept so the oracle is exact).
  *
  * Scale shape: a pure per-row scalar over the raw UTF-8 bytes — no
  * allocation beyond two small flag arrays, participates in whole-stage
  * codegen via `defineCodeGen` (a static call, like Spark's own
  * `levenshtein`), so it fuses into the surrounding generated loop.
  */
object JaroWinklerKernel {

  /** Plain Jaro similarity over UTF-8 bytes. */
  def jaro(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.getBytes; val b = ub.getBytes
    val la = a.length; val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val md = math.max(math.max(la, lb) / 2 - 1, 0)
    val fa = new Array[Boolean](la)
    val fb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - md)
      val hi = math.min(lb, i + md + 1)
      var j = lo
      var hit = false
      while (j < hi && !hit) {
        if (!fb(j) && a(i) == b(j)) {
          fa(i) = true; fb(j) = true; m += 1; hit = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (fa(i)) {
        while (!fb(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
  }

  /** Jaro–Winkler: prefix boost (scale 0.1, prefix ≤ 4) applied only when
    * the Jaro similarity exceeds the 0.7 boost threshold. */
  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val j = jaro(ua, ub)
    if (j <= 0.7) return j
    val a = ua.getBytes; val b = ub.getBytes
    val n = math.min(4, math.min(a.length, b.length))
    var p = 0
    while (p < n && a(p) == b(p)) p += 1
    j + p * 0.1 * (1.0 - j)
  }
}

case class JaroSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerKernel.jaro(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaroWinklerKernel.jaro((org.apache.spark.unsafe.types.UTF8String) $a, (org.apache.spark.unsafe.types.UTF8String) $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerKernel.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaroWinklerKernel.jaroWinkler((org.apache.spark.unsafe.types.UTF8String) $a, (org.apache.spark.unsafe.types.UTF8String) $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object JaroWinkler {

  def jaroSim(a: Column, b: Column): Column =
    call_function("jaro_sim", a, b)

  def jaroWinklerSim(a: Column, b: Column): Column =
    call_function("jaro_winkler_sim", a, b)

  /** Register `jaro_sim` / `jaro_winkler_sim` for spark.sql(...) and the
    * Column helpers above. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_sim",
      { exprs =>
        require(exprs.length == 2, "jaro_sim(a, b)")
        JaroSimilarity(exprs(0), exprs(1))
      }, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler_sim",
      { exprs =>
        require(exprs.length == 2, "jaro_winkler_sim(a, b)")
        JaroWinklerSimilarity(exprs(0), exprs(1))
      }, "scala_udf")
  }
}

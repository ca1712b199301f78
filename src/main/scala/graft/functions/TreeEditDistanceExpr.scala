package graft.functions

import graft.zs.{PTree, Scorer}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType}

/** SQL-surface form of the Zhang–Shasha scorer:
  * `tree_edit_distance(labelsA, lmdsA, keyrootsA, labelsB, lmdsB, keyrootsB)`
  * over the flattened postorder arrays a TreeRow carries.
  *
  * Mirrors the reference's `simple_distance` entry point
  * (zss/compare.py anchor `def simple_distance`) for SQL users; the
  * pipeline's hot path stays in `mapPartitions` (SURVEY.md §5: a
  * CodegenFallback expression evaluates per-row through the interpreted
  * path — fine for the SQL convenience surface, not for the bulk
  * scoring stage, and the per-thread Scorer still reuses scratch
  * buffers between rows).
  */
case class TreeEditDistance(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.length == 6,
    "tree_edit_distance(labelsA, lmdsA, keyrootsA, labelsB, lmdsB, keyrootsB)")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  // one reusable kernel per expression instance per thread
  @transient private lazy val scorer = new ThreadLocal[Scorer] {
    override def initialValue(): Scorer = new Scorer
  }

  private def strings(a: ArrayData): Array[String] = {
    val n = a.numElements()
    val out = new Array[String](n)
    var i = 0
    while (i < n) { out(i) = a.getUTF8String(i).toString; i += 1 }
    out
  }
  private def ints(a: ArrayData): Array[Int] = a.toIntArray()

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val a = PTree(strings(vs(0).asInstanceOf[ArrayData]),
      ints(vs(1).asInstanceOf[ArrayData]), ints(vs(2).asInstanceOf[ArrayData]))
    val b = PTree(strings(vs(3).asInstanceOf[ArrayData]),
      ints(vs(4).asInstanceOf[ArrayData]), ints(vs(5).asInstanceOf[ArrayData]))
    scorer.get().dist(a, b)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object TreeEditDistance {

  /** Column-API form (requires [[register]] on the active session — the
    * Column resolves through the function registry). */
  def treeEditDistance(labelsA: Column, lmdsA: Column, keyrootsA: Column,
                       labelsB: Column, lmdsB: Column, keyrootsB: Column): Column =
    call_function("tree_edit_distance",
      labelsA, lmdsA, keyrootsA, labelsB, lmdsB, keyrootsB)

  /** Register `tree_edit_distance` for spark.sql(...) use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tree_edit_distance", exprs => TreeEditDistance(exprs), "scala_udf")
}

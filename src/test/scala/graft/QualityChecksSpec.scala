package graft

import graft.operators.QualityChecks
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualityChecksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("row checks compute exact metrics and verdicts") {
    import spark.implicits._
    val df = Seq(
      (Some(1), 10.0), (Some(2), 60.0), (None, 5.0), (Some(4), 20.0))
      .toDF("id", "v")
    val got = QualityChecks.runRowChecks(df, Seq(
      QualityChecks.completeness("complete_id", col("id")),
      QualityChecks.satisfies("v_lt_50", col("v") < 50, minFraction = 0.5)))
      .as[(String, Double, Boolean)].collect()
      .map { case (k, v, p) => k -> ((v, p)) }.toMap
    assert(got("complete_id") == (0.75, false))
    assert(got("v_lt_50") == (0.75, true))
  }

  test("null predicate values count as failures, not as nulls") {
    import spark.implicits._
    val df = Seq(Some(1.0), None, Some(3.0)).toDF("v")
    val row = QualityChecks.runRowChecks(df,
      Seq(QualityChecks.satisfies("v_pos", col("v") > 0))).head()
    assert(math.abs(row.getDouble(1) - 0.666667) < 1e-9)
    assert(!row.getBoolean(2))
  }

  test("uniqueness detects composite-key duplicates; RI detects orphans") {
    import spark.implicits._
    val child = Seq((1, 1, 10), (1, 1, 11), (2, 1, 12)).toDF("a", "b", "fk")
    val parent = Seq(10, 12).toDF("pk")
    val uniq = QualityChecks.uniqueness(child, Seq("a", "b")).head()
    assert(!uniq.getBoolean(2) && math.abs(uniq.getDouble(1) - 2.0 / 3) < 1e-6)
    val ri = QualityChecks.referentialIntegrity(child, "fk", parent, "pk").head()
    assert(!ri.getBoolean(2) && math.abs(ri.getDouble(1) - 2.0 / 3) < 1e-6)
  }

  test("the whole row-check suite is ONE scan of the table (single aggregate, no joins)") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val s = QualityChecks.runRowChecks(li, Seq(
      QualityChecks.completeness("c1", col("l_orderkey")),
      QualityChecks.satisfies("c2", col("l_quantity") > 0),
      QualityChecks.satisfies("c3", col("l_discount") <= 0.1),
      QualityChecks.satisfies("c4", col("l_extendedprice") > 0)))
      .queryExecution.explainString(FormattedMode)
    // count only plan-tree occurrences ("Scan parquet  (n)"), not the
    // detail block repeating the node name
    assert(s.linesIterator.count(_.matches(".*Scan parquet\\s*\\(\\d+\\)$")) == 1,
      s"row-check suite must read the table exactly once\n$s")
    assert(!s.contains("Join"), s"row-check suite must not join\n$s")
    assert(s.contains("partial"), "map-side partial aggregation lost")
  }
}

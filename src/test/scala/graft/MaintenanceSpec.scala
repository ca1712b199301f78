package graft

import graft.operators.{IncrementalAgg, TableDiff}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MaintenanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")

  // ---- TableDiff --------------------------------------------------------

  test("diff classifies inserts, updates, deletes; equal rows emit nothing") {
    import spark.implicits._
    val oldDf = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("id", "v", "n")
    val newDf = Seq((1L, "a", 10), (2L, "B", 20), (4L, "d", 40)).toDF("id", "v", "n")
    val got = TableDiff.diff(oldDf, newDf, Seq("id"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((2L, "update"), (3L, "delete"), (4L, "insert")))
    val payload = TableDiff.changedRows(newDf, TableDiff.diff(oldDf, newDf, Seq("id")), Seq("id"))
      .as[(Long, String, Int)].collect().toSet
    assert(payload == Set((2L, "B", 20), (4L, "d", 40)))
  }

  test("diff is insensitive to column order and NULL-safe") {
    import spark.implicits._
    val oldDf = Seq((1L, Some("a"), 10), (2L, None, 20)).toDF("id", "v", "n")
    // same data, columns reordered — the sorted struct hash must agree
    val newDf = oldDf.select(col("n"), col("id"), col("v"))
    assert(TableDiff.diff(oldDf, newDf, Seq("id")).isEmpty)
    // a null→value transition IS an update
    val changed = Seq((1L, Some("a"), 10), (2L, Some("x"), 20)).toDF("id", "v", "n")
    assert(TableDiff.diff(oldDf, changed, Seq("id"))
      .as[(Long, String)].collect().toSet == Set((2L, "update")))
  }

  test("diff of a snapshot against itself is empty on real data") {
    assert(TableDiff.diff(events, events, Seq("event_id")).isEmpty)
  }

  test("plan: only (key, hash) cross the diff join — wide columns pruned from both scans") {
    import org.apache.spark.sql.execution.FormattedMode
    val s = TableDiff.diff(events, events.withColumn("value", col("value") + 1),
      Seq("event_id")).queryExecution.explainString(FormattedMode)
    // both parquet scans must read only the columns the hash needs, and
    // the join keys/hashes — confirmed by ReadSchema not being consulted
    // post-join for wide fetches (no second scan of either snapshot)
    assert(s.linesIterator.count(_.matches(".*Scan parquet\\s*\\(\\d+\\)$")) == 2, s)
    assert(s.contains("xxhash64"), "hash projection missing")
  }

  test("randomized differential: diff matches an in-memory reference model across seeds") {
    import spark.implicits._
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val oldRows = (0 until 300).map(i => (i.toLong, rnd.nextInt(5).toString, rnd.nextInt(100)))
      // mutate: ~1/5 deleted, ~1/5 updated, ~1/10 new keys
      val kept = oldRows.filterNot(_ => rnd.nextInt(5) == 0)
      val mutated = kept.map { case (id, v, n) =>
        if (rnd.nextInt(5) == 0) (id, v + "x", n) else (id, v, n)
      }
      val inserted = (0 until 30).map(i => (1000L + i, "new", i))
      val newRows = mutated ++ inserted
      // reference model: plain Scala maps
      val om = oldRows.map(r => r._1 -> ((r._2, r._3))).toMap
      val nm = newRows.map(r => r._1 -> ((r._2, r._3))).toMap
      val expect =
        nm.collect { case (k, v) if !om.contains(k) => k -> "insert"
                     case (k, v) if om(k) != v => k -> "update" } ++
        om.collect { case (k, _) if !nm.contains(k) => k -> "delete" }
      val got = TableDiff.diff(
          oldRows.toDF("id", "v", "n"), newRows.toDF("id", "v", "n"), Seq("id"))
        .as[(Long, String)].collect().toMap
      assert(got == expect.toMap, s"seed $seed")
    }
  }

  // ---- IncrementalAgg ---------------------------------------------------

  private def stateFor(pred: org.apache.spark.sql.Column) =
    IncrementalAgg.aggregate(events.where(pred), Seq("event_type"), Seq("value"))

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[String, (Long, BigDecimal)] =
    df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), BigDecimal(r.getDecimal(2))))).toMap

  test("state ⊕ delta == one-pass aggregate, exactly (decimal monoid)") {
    val full = asMap(IncrementalAgg.aggregate(events, Seq("event_type"), Seq("value")))
    val merged = asMap(IncrementalAgg.merge(
      stateFor(pmod(col("event_id"), lit(4)) =!= 0),
      stateFor(pmod(col("event_id"), lit(4)) === 0),
      Seq("event_type"), Seq("value")))
    assert(merged == full)
  }

  test("folding 4 deltas one at a time equals the one-pass aggregate") {
    val full = asMap(IncrementalAgg.aggregate(events, Seq("event_type"), Seq("value")))
    val folded = (1 until 4).foldLeft(stateFor(pmod(col("event_id"), lit(4)) === 0)) {
      (st, b) => IncrementalAgg.merge(st,
        stateFor(pmod(col("event_id"), lit(4)) === b), Seq("event_type"), Seq("value"))
    }
    assert(asMap(folded) == full)
  }

  test("a signed (negated) delta retracts rows exactly") {
    import spark.implicits._
    val base = Seq(("a", 1.5), ("a", 2.5), ("b", 4.0)).toDF("event_type", "value")
    val st = IncrementalAgg.aggregate(base, Seq("event_type"), Seq("value"))
    // retract ("a", 2.5): negate the measure, count -1
    val retract = IncrementalAgg.aggregate(
        Seq(("a", -2.5)).toDF("event_type", "value"), Seq("event_type"), Seq("value"))
      .withColumn("n", lit(-1L))
    val after = asMap(IncrementalAgg.merge(st, retract, Seq("event_type"), Seq("value")))
    assert(after("a") == ((1L, BigDecimal("1.500000"))))
    assert(after("b") == ((1L, BigDecimal("4.000000"))))
  }
}

package graft

import graft.operators.{IncrementalAgg, QualityChecks, TableDiff, ZOrder}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout, data-quality, and table-maintenance coverage: z-order
  * multi-dimensional file skipping, the single-pass constraint
  * validation suite, snapshot diff (CDC), and incremental aggregate
  * maintenance. All pure deterministic relational algebra, so the
  * DuckDB oracle replays every derivation (the z-value bit interleave
  * SQL is GENERATED from the same constants as the Scala expression —
  * one definition, two engines).
  */
object LayoutQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Query box per dimension, as percent of the value range — center
    * 10 % slice. Shared by the Scala query and the generated SQL. */
  private val BoxLoPct = 45L
  private val BoxHiPct = 55L

  /** The three probe boxes: both dims constrained, x only, y only. */
  private val Boxes: Seq[(String, Boolean, Boolean)] =
    Seq(("xy", true, true), ("x", true, false), ("y", false, true))

  /** Point-lookup key for the bloom-index query (an order present at
    * every SF — orderkeys start at 0). */
  private val BloomLookupKey = 42L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // z-order vs single-dim-sort layout: per-file min/max index pruning
    // stats for a 2-D box, an x-only and a y-only predicate. The
    // payoff: the z layout prunes on BOTH dimensions; the linear
    // layout serves only its sort key (scans everything for y-only)
    "q_zorder_skipping" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey").cast("long").as("x"),
          col("l_orderkey").cast("long").as("y"))
      // one O(1)-row stats agg (the normalization envelope — at scale a
      // stats-table read, not a scan)
      val st = li.agg(min(col("x")), max(col("x")), min(col("y")), max(col("y"))).head()
      val (xmn, xmx, ymn, ymx) = (st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3))
      val shift = ZOrder.DimBits - ZOrder.PrefixBits

      val zfiled = ZOrder.withZFile(li, col("x"), col("y"), xmn, xmx, ymn, ymx)
      val lfiled = li.withColumn("zfile",
        shiftright(ZOrder.normalize(col("x"), lit(xmn), lit(xmx)), shift))
      def box(dim: (Long, Long), on: Boolean): Option[(Long, Long)] = {
        val (mn, mx) = dim
        if (!on) None
        else Some((mn + (mx - mn) * BoxLoPct / 100, mn + (mx - mn) * BoxHiPct / 100))
      }
      val layouts = Seq("z" -> zfiled, "linear" -> lfiled)
      val rows = layouts.flatMap { case (name, df) =>
        val idx = ZOrder.minMaxIndex(df, "zfile", col("x"), col("y"))
          .persist()
        Boxes.map { case (bname, xOn, yOn) =>
          val xr = box((xmn, xmx), xOn); val yr = box((ymn, ymx), yOn)
          val xOk = xr.map { case (lo, hi) =>
            col("x_max") >= lo && col("x_min") <= hi }.getOrElse(lit(true))
          val yOk = yr.map { case (lo, hi) =>
            col("y_max") >= lo && col("y_min") <= hi }.getOrElse(lit(true))
          idx.agg(
            lit(name).as("layout"), lit(bname).as("box"),
            count(lit(1)).as("n_files"),
            sum(when(xOk && yOk, 1L).otherwise(0L)).as("files_scanned"),
            sum(col("n_rows")).as("rows_total"),
            sum(when(xOk && yOk, col("n_rows")).otherwise(0L)).as("rows_scanned"))
        }
      }
      rows.reduce(_ unionByName _).orderBy(col("layout"), col("box"))
    }),

    // per-tile bloom sidecar over a NON-layout column: the layout
    // serves (part, supplier) analytics; the bloom serves "this
    // order's lines" point lookups — an order's few lines scatter into
    // few tiles, so most files prune. No false negatives, so the
    // result is EXACTLY the plain filter — which is what the oracle
    // computes. The pruning level itself is asserted in ZOrderSpec
    // (bloom bits aren't cross-engine reproducible)
    "q_bloom_index" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey").cast("long").as("x"),
          col("l_suppkey").cast("long").as("y"),
          col("l_orderkey"), col("l_linenumber"))
      val st = li.agg(min(col("x")), max(col("x")), min(col("y")), max(col("y"))).head()
      val zfiled = ZOrder.withZFile(li, col("x"), col("y"),
        st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3)).persist()
      val idx = ZOrder.bloomIndex(zfiled, "zfile", "l_orderkey",
        expectedPerFile = 65536L)
      val files = ZOrder.bloomPrunedFiles(idx, "zfile", BloomLookupKey)
      zfiled.where(col("zfile").isin(files: _*) &&
          col("l_orderkey") === BloomLookupKey)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("x").as("l_partkey"), col("y").as("l_suppkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
    }),

    // snapshot diff (CDC): deterministic mutations of the documents
    // table classified as insert/update/delete via narrow
    // (key, row-hash) streams — the engine compares hashes, the oracle
    // replays the mutation rules directly; both must agree exactly
    "q_table_diff" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val newSnap = docs.where(pmod(col("doc_id"), lit(13)) =!= 0)
        .withColumn("text",
          when(pmod(col("doc_id"), lit(7)) === 0, upper(col("text")))
            .otherwise(col("text")))
        .unionByName(docs.where(pmod(col("doc_id"), lit(11)) === 3)
          .withColumn("doc_id", col("doc_id") + 100000L))
      TableDiff.diff(docs, newSnap, Seq("doc_id"))
        .orderBy(col("doc_id"), col("op"))
    }),

    // incremental exact-aggregate maintenance: state over 3/4 of the
    // events ⊕ the remaining delta == one aggregation over everything
    // (count/decimal-sum monoids — the oracle computes the full agg)
    "q_incr_agg" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val state = IncrementalAgg.aggregate(
        ev.where(pmod(col("event_id"), lit(4)) =!= 0), Seq("event_type"), Seq("value"))
      val deltaAgg = IncrementalAgg.aggregate(
        ev.where(pmod(col("event_id"), lit(4)) === 0), Seq("event_type"), Seq("value"))
      IncrementalAgg.withAvg(
          IncrementalAgg.merge(state, deltaAgg, Seq("event_type"), Seq("value")),
          Seq("value"))
        .select(col("event_type"), col("n"),
          col("sum_value").cast("double").as("sum_value"), col("avg_value"))
        .orderBy(col("event_type"))
    }),

    // one-scan data-quality suite + the shuffle-bearing checks
    // (composite-key uniqueness — genuinely violated in this data —
    // and referential integrity)
    "q_dq_checks" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val rowChecks = QualityChecks.runRowChecks(li, Seq(
        QualityChecks.completeness("complete_l_orderkey", col("l_orderkey")),
        QualityChecks.satisfies("qty_in_1_50",
          col("l_quantity") >= 1 && col("l_quantity") <= 50),
        QualityChecks.satisfies("discount_in_0_01",
          col("l_discount") >= 0 && col("l_discount") <= 0.1),
        QualityChecks.satisfies("price_positive", col("l_extendedprice") > 0),
        QualityChecks.satisfies("ship_before_2000",
          col("l_shipdate") < lit("2000-01-01").cast("timestamp"),
          minFraction = 0.5)))
      rowChecks
        .unionByName(QualityChecks.uniqueness(li, Seq("l_orderkey", "l_linenumber")))
        .unionByName(QualityChecks.referentialIntegrity(
          li, "l_partkey", t(s, dir, "part"), "p_partkey"))
        .orderBy(col("check_name"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_zorder_skipping" -> zorderSql,
    "q_bloom_index" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  CAST(l_partkey AS BIGINT) AS l_partkey,
         |  CAST(l_suppkey AS BIGINT) AS l_suppkey
         |FROM lineitem WHERE l_orderkey = $BloomLookupKey
         |ORDER BY l_linenumber, l_partkey, l_suppkey""".stripMargin,
    // the oracle replays the mutation RULES; the engine must reach the
    // same classification through its row-hash compare
    "q_table_diff" ->
      """SELECT doc_id, 'delete' AS op FROM documents WHERE doc_id % 13 = 0
        |UNION ALL
        |SELECT doc_id, 'update' FROM documents
        |WHERE doc_id % 13 <> 0 AND doc_id % 7 = 0 AND upper(text) <> text
        |UNION ALL
        |SELECT doc_id + 100000, 'insert' FROM documents WHERE doc_id % 11 = 3
        |ORDER BY doc_id, op""".stripMargin,
    // the oracle aggregates the FULL events table in one pass — the
    // incremental state ⊕ delta must equal it exactly (decimal monoid)
    "q_incr_agg" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value,
        |  round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / count(*), 6) AS avg_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_dq_checks" ->
      """WITH row_checks AS (
        |  SELECT 'complete_l_orderkey' AS check_name, round(avg(CASE WHEN l_orderkey IS NOT NULL THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END), 6) AS metric, true AS needs_full FROM lineitem
        |  UNION ALL
        |  SELECT 'qty_in_1_50', round(avg(CASE WHEN l_quantity >= 1 AND l_quantity <= 50 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END), 6), true FROM lineitem
        |  UNION ALL
        |  SELECT 'discount_in_0_01', round(avg(CASE WHEN l_discount >= 0 AND l_discount <= 0.1 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END), 6), true FROM lineitem
        |  UNION ALL
        |  SELECT 'price_positive', round(avg(CASE WHEN l_extendedprice > 0 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END), 6), true FROM lineitem
        |  UNION ALL
        |  SELECT 'ship_before_2000', round(avg(CASE WHEN l_shipdate < TIMESTAMP '2000-01-01' THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END), 6), false FROM lineitem),
        |uniq AS (
        |  SELECT 'unique_l_orderkey_l_linenumber' AS check_name,
        |    round(CAST(count(DISTINCT (l_orderkey, l_linenumber)) AS DOUBLE) / count(*), 6) AS metric,
        |    count(DISTINCT (l_orderkey, l_linenumber)) = count(*) AS pass
        |  FROM lineitem),
        |ri AS (
        |  SELECT 'ri_l_partkey_in_p_partkey' AS check_name,
        |    round(CAST((SELECT count(*) FROM lineitem WHERE l_partkey IN (SELECT p_partkey FROM part)) AS DOUBLE)
        |      / (SELECT count(*) FROM lineitem), 6) AS metric,
        |    (SELECT count(*) FROM lineitem WHERE l_partkey NOT IN (SELECT p_partkey FROM part)) = 0 AS pass)
        |SELECT check_name, CAST(metric AS DOUBLE) AS metric,
        |  CASE WHEN needs_full THEN metric >= 1.0 ELSE metric >= 0.5 END AS pass
        |FROM row_checks
        |UNION ALL SELECT check_name, metric, pass FROM uniq
        |UNION ALL SELECT check_name, metric, pass FROM ri
        |ORDER BY check_name""".stripMargin
  )

  /** DuckDB replay of the whole z-order derivation, generated from the
    * SAME bit/percent constants as the Scala side. */
  private def zorderSql: String = {
    val bits = ZOrder.DimBits
    val shift = bits - ZOrder.PrefixBits
    val maxN = (1L << bits) - 1
    val ileave = ZOrder.interleaveSql("xn", "yn", bits)
    val boxSelects = Seq("z" -> "zi", "linear" -> "li2").flatMap { case (name, idx) =>
      Boxes.map { case (bname, xOn, yOn) =>
        val xOk = if (xOn) "(x_max >= b.xlo AND x_min <= b.xhi)" else "true"
        val yOk = if (yOn) "(y_max >= b.ylo AND y_min <= b.yhi)" else "true"
        s"""SELECT '$name' AS layout, '$bname' AS box,
           |  CAST(count(*) AS BIGINT) AS n_files,
           |  CAST(sum(CASE WHEN $xOk AND $yOk THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
           |  CAST(sum(n_rows) AS BIGINT) AS rows_total,
           |  CAST(sum(CASE WHEN $xOk AND $yOk THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned
           |FROM $idx, b""".stripMargin
      }
    }.mkString("\n", "\nUNION ALL\n", "\n")
    s"""WITH pts AS (
       |  SELECT CAST(l_partkey AS BIGINT) AS x, CAST(l_orderkey AS BIGINT) AS y
       |  FROM lineitem),
       |st AS (SELECT min(x) AS xmn, max(x) AS xmx, min(y) AS ymn, max(y) AS ymx FROM pts),
       |n AS (
       |  SELECT x, y,
       |    ((x - xmn) * $maxN) // (xmx - xmn) AS xn,
       |    ((y - ymn) * $maxN) // (ymx - ymn) AS yn
       |  FROM pts, st),
       |f AS (SELECT x, y, $ileave >> ${2 * bits - ZOrder.PrefixBits} AS zf, xn >> $shift AS lf FROM n),
       |zi AS (SELECT zf, min(x) AS x_min, max(x) AS x_max, min(y) AS y_min, max(y) AS y_max, count(*) AS n_rows FROM f GROUP BY zf),
       |li2 AS (SELECT lf, min(x) AS x_min, max(x) AS x_max, min(y) AS y_min, max(y) AS y_max, count(*) AS n_rows FROM f GROUP BY lf),
       |b AS (
       |  SELECT xmn + (xmx - xmn) * $BoxLoPct // 100 AS xlo,
       |         xmn + (xmx - xmn) * $BoxHiPct // 100 AS xhi,
       |         ymn + (ymx - ymn) * $BoxLoPct // 100 AS ylo,
       |         ymn + (ymx - ymn) * $BoxHiPct // 100 AS yhi
       |  FROM st)
       |SELECT * FROM ($boxSelects) AS u
       |ORDER BY layout, box""".stripMargin
  }
}

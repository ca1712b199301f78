package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator coverage over the driver's TPC-H-ish tables, every
  * query DuckDB-oracle-checked (SparkEntry.oracleSql). Float discipline:
  * all aggregated arithmetic runs in DECIMAL (exact, order-independent)
  * and is cast to double only at the end, so Spark and DuckDB hash
  * identically; output rows are deterministically ordered.
  *
  * The reference library has no relational layer at all (SURVEY.md §3a)
  * — these exercise the Spark-native engine around the scorer: scans
  * with pushdown, hash aggregates, broadcast/semi/anti joins, windows,
  * sorts/limits, set ops, scalar functions.
  */
object RelQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // scan + filter + hash aggregate, decimal-exact sums
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") < lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(BigDecimal(1)) - col("l_discount").cast("decimal(18,2)"))).cast("decimal(28,4)"))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // broadcast join + aggregate + top-n with deterministic tiebreak
    "q3_topn" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      li.join(broadcast(orders), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderpriority"))
        .agg(sum((col("l_extendedprice").cast("decimal(18,2)") *
          (lit(BigDecimal(1)) - col("l_discount").cast("decimal(18,2)"))).cast("decimal(28,4)"))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // anti join: customers with no high-value orders
    "q_anti_join" -> ((s, dir) => {
      val bigOrders = t(s, dir, "orders").where(col("o_totalprice") > 300000.0)
      t(s, dir, "customer")
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // semi join + multi-way broadcast join through the star schema
    "q_star_join" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      val orders = t(s, dir, "orders")
      cust
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .join(orders, col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("sum_acctbal"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // window function: top line per supplier by price, deterministic ties
    "q_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      t(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
        .orderBy(col("l_suppkey"))
    }),

    // running aggregate window over time per user (events table)
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("running_value",
          sum(col("value").cast("decimal(18,2)")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("double"))
        .select(col("user_id"), col("event_id"), col("running_value"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // set ops: parts referenced by lineitem INTERSECT large parts,
    // EXCEPT cheap parts — distinct-set semantics on both engines
    "q_setops" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_partkey").as("k")).distinct()
      val big = t(s, dir, "part").where(col("p_size") >= 25).select(col("p_partkey").as("k"))
      val cheap = t(s, dir, "part").where(col("p_retailprice") < 500.0).select(col("p_partkey").as("k"))
      li.intersect(big).except(cheap).orderBy(col("k"))
    }),

    // JSON scalar functions: parse the props column with an explicit
    // schema (from_json → struct field), aggregate the extracted value
    // — the semi-structured half of the scalar surface. Parsing runs
    // map-side inside codegen; only (type, k) reaches the aggregate
    "q_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_type"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
            .getField("k").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),

    // scalar functions: date parts, string ops, math — grouped counts
    "q_scalars" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          upper(substring(col("o_orderpriority"), 1, 1)).as("prio"),
          (col("o_totalprice") > 100000.0).as("is_big"))
        .groupBy(col("yr"), col("mo"), col("prio"), col("is_big"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("yr"), col("mo"), col("prio"), col("is_big"))
    }),

    // grouped top-k per group via window + dense ranking over aggregates
    "q_topk_per_group" -> ((s, dir) => {
      val agg = t(s, dir, "lineitem")
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("qty").desc, col("l_partkey"))
      agg.withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .select(col("l_suppkey"), col("l_partkey"), col("qty"), col("rk"))
        .orderBy(col("l_suppkey"), col("rk"))
    }),

    // tumbling-window batch aggregation over the event stream table —
    // the batch twin of the Structured Streaming query (StreamingSpec
    // asserts streaming == this)
    "q_events_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(
          (floor(unix_timestamp(col("ts")) / 300) * 300).cast("long").as("win_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy(col("win_start"), col("event_type"))
    }),

    // per-user sessionization (gap 30 min) — the batch twin of
    // StreamingIngest.sessionize (stream ≡ batch asserted in
    // StreamingSpec); the oracle redoes the islands-and-gaps window
    // pattern independently
    "q_sessions" -> ((s, dir) => {
      graft.streaming.StreamingIngest.sessionizeBatch(t(s, dir, "events"), SessionGapSec)
        .orderBy(col("user_id"), col("start_ts"))
    }),

    // as-of (point-in-time) join: each click joined to the user's most
    // recent prior purchase — union + ONE window pass, no join operator
    // at all (AsOfJoin.asOf; single-exchange plan locked in
    // AsOfJoinSpec). The oracle is a genuinely independent
    // implementation: DuckDB's native ASOF JOIN.
    "q_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val left = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val right = graft.operators.AsOfJoin.latestPerKeyTs(
        ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"), col("value")),
        "user_id", "ts", "event_id")
        .withColumn("r_sec", unix_timestamp(col("ts")))
      graft.operators.AsOfJoin.asOf(left, right, "user_id", "ts",
        Map("r_sec" -> "ref_sec", "event_id" -> "ref_event_id", "value" -> "ref_value"))
        .select(col("user_id"),
          unix_timestamp(col("ts")).as("sec"),
          col("event_id"),
          coalesce(col("ref_sec"), lit(-1L)).as("ref_sec"),
          coalesce(col("ref_event_id"), lit(-1L)).as("ref_event_id"),
          coalesce(col("ref_value"), lit(-1.0)).as("ref_value"))
        .orderBy(col("event_id"))
    }),

    // interval (range) join: view→click conversion pairs within 2 h on
    // the same user — equi-key hash join + range residual, never a
    // cross product (AsOfJoin.intervalJoin). Batch twin of the
    // stream-stream watermarked join (StreamingJoinSpec asserts ≡).
    "q_interval_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val a = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"))
      val b = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      graft.operators.AsOfJoin.intervalJoin(a, b, "user_id", "ts", IntervalJoinSec)
        .select(col("a_user_id").as("user_id"),
          col("a_event_id").as("view_id"),
          col("b_event_id").as("click_id"),
          (unix_timestamp(col("b_ts")) -
            unix_timestamp(col("a_ts"))).as("lag_sec"))
        .orderBy(col("view_id"), col("click_id"))
    }),

    // pivot: one column per event type, decimal-exact sums — the
    // wide-table reshape (explicit value list, so the plan is a single
    // hash aggregate, no distinct-values pre-pass). Oracle redoes it as
    // CASE aggregation
    "q_pivot" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", PivotEventTypes)
        .agg(sum(col("value").cast("decimal(18,2)")).cast("double"))
        .orderBy(col("user_id"))
    }),

    // rollup (grouping sets): per-(lang, source) counts with subtotal
    // and grand-total rows, grouping_id disambiguating the levels
    "q_rollup" -> ((s, dir) => {
      t(s, dir, "documents")
        .rollup(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
        .orderBy(col("gid"), col("lang"), col("source"))
    }),

    // cube: all 2^k grouping-set combinations (rollup's superset —
    // adds the (·, source) marginal), disambiguated by grouping_id
    "q_cube" -> ((s, dir) => {
      t(s, dir, "documents")
        .cube(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
        .orderBy(col("gid"), col("lang"), col("source"))
    }),

    // time-RANGE window frame: per-user moving 1-hour event-value sum
    // ordered by event time — RANGE semantics (all rows within the
    // interval, not a fixed row count), decimal-exact
    "q_window_range" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_sec"))
        .rangeBetween(-WindowRangeSec, 0)
      t(s, dir, "events")
        .withColumn("ts_sec", unix_timestamp(col("ts")))
        .withColumn("moving_sum",
          sum(col("value").cast("decimal(18,2)")).over(w).cast("double"))
        .select(col("user_id"), col("event_id"), col("moving_sum"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // unpivot (melt): the inverse reshape — unpivot(pivot(events)) must
    // equal the plain groupBy, which is exactly what the oracle
    // computes (the roundtrip IS the check). Null cells (user never did
    // the event type) drop, matching the group-by's absent groups
    "q_unpivot" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", PivotEventTypes)
        .agg(sum(col("value").cast("decimal(18,2)")).cast("double"))
        .unpivot(Array(col("user_id")), PivotEventTypes.map(col).toArray,
          "event_type", "sum_value")
        .where(col("sum_value").isNotNull)
        .orderBy(col("user_id"), col("event_type"))
    }),

    // bloom-filter semi-join reduction: the big side is pruned by a
    // fixed-size sketch of the dim keys BEFORE the shuffle join
    // (BloomJoin; plan shape locked in BloomJoinSpec). No false
    // negatives + the join removing false positives ⇒ the result is
    // EXACTLY the plain join, which is what the oracle computes
    "q_bloom_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
      val bigParts = t(s, dir, "part").where(col("p_size") >= 45)
        .select(col("p_partkey"), col("p_size"))
      graft.operators.BloomJoin.prefilteredJoin(
          li, bigParts, "l_partkey", "p_partkey",
          expectedItems = 100000L, fpp = 0.01)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("p_partkey"), col("p_size"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // SCD type-2 merge: full-history dimension versioning. Updates for
    // 3-multiples (6-multiples actually change segment, the rest are
    // no-ops), 50-multiples re-keyed as brand-new customers. The
    // oracle replays close/open/no-op with LEFT JOIN + NOT EXISTS
    "q_scd2" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val dim = cust.select(
        col("c_custkey").as("key"), col("c_mktsegment").as("seg"),
        lit("2020-01-01").cast("timestamp").as("valid_from"),
        lit(null).cast("timestamp").as("valid_to"),
        lit(true).as("is_current"))
      val upd = cust.where(pmod(col("c_custkey"), lit(3)) === 0)
        .select(col("c_custkey").as("key"),
          when(pmod(col("c_custkey"), lit(6)) === 0, reverse(col("c_mktsegment")))
            .otherwise(col("c_mktsegment")).as("seg"),
          lit("2021-06-01").cast("timestamp").as("ts"))
        .unionByName(cust.where(pmod(col("c_custkey"), lit(50)) === 0)
          .select((col("c_custkey") + 1000000L).as("key"),
            lit("SEGNEW").as("seg"), lit("2021-06-01").cast("timestamp").as("ts")))
      graft.operators.Upsert.scd2Merge(dim, upd, "key", Seq("seg"), "ts")
        // ISO strings, not raw timestamps: the parquet↔pandas↔DuckDB
        // roundtrip disagrees on timestamp resolution (ns vs us)
        .select(col("key"), col("seg"),
          date_format(col("valid_from"), "yyyy-MM-dd").as("valid_from"),
          date_format(col("valid_to"), "yyyy-MM-dd").as("valid_to"),
          col("is_current"))
        .orderBy(col("key"), col("valid_from"), col("is_current"))
    }),

    // EXACT percentiles (sort-based, not the approx sketch) per group —
    // both engines interpolate (1−f)·lower + f·upper; rounded to 6dp
    "q_percentiles" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.25)"), 6).as("p25"),
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.75)"), 6).as("p75"))
        .orderBy(col("event_type"))
    })
  )

  /** q_pivot's explicit column list — ONE definition for the Scala
    * query and the generated oracle CASE aggregation. */
  private val PivotEventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** q_interval_join window — ONE definition for the Scala query, the
    * interpolated oracle SQL, and the streaming twin's spec. */
  val IntervalJoinSec = 7200L

  /** q_sessions gap — ONE definition for the Scala query and the
    * interpolated oracle SQL. */
  private val SessionGapSec = 1800L
  private val WindowRangeSec = 3600L

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topn" ->
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderkey, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q_star_join" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q_window" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem) WHERE rn = 1 ORDER BY l_suppkey""".stripMargin,
    "q_window_running" ->
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q_setops" ->
      """(SELECT DISTINCT l_partkey AS k FROM lineitem
        | INTERSECT SELECT p_partkey AS k FROM part WHERE p_size >= 25)
        |EXCEPT SELECT p_partkey AS k FROM part WHERE p_retailprice < 500.0
        |ORDER BY k""".stripMargin,
    "q_scalars" ->
      """SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        |  upper(substring(o_orderpriority, 1, 1)) AS prio,
        |  o_totalprice > 100000.0 AS is_big, count(*) AS n
        |FROM orders GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""".stripMargin,
    "q_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
        |  max(CAST(props->>'$.k' AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_topk_per_group" ->
      """SELECT l_suppkey, l_partkey, qty, rk FROM (
        |  SELECT l_suppkey, l_partkey, qty,
        |    row_number() OVER (PARTITION BY l_suppkey ORDER BY qty DESC, l_partkey) AS rk
        |  FROM (SELECT l_suppkey, l_partkey,
        |          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |        FROM lineitem GROUP BY l_suppkey, l_partkey))
        |WHERE rk <= 3 ORDER BY l_suppkey, rk""".stripMargin,
    "q_events_window" ->
      """SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS win_start, event_type,
        |  count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // islands-and-gaps sessionization redone independently: break =
    // per-user gap > 1800 s, session id = running break count
    "q_sessions" ->
      s"""WITH e AS (
        |  -- floor, not cast: DuckDB's BIGINT cast rounds fractional
        |  -- seconds while Spark's unix_timestamp truncates
        |  SELECT CAST(user_id AS BIGINT) AS user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events),
        |b AS (
        |  SELECT user_id, sec,
        |    CASE WHEN sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec) > $SessionGapSec
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |s AS (
        |  SELECT user_id, sec,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY sec
        |                   ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM b)
        |SELECT user_id, min(sec) AS start_ts, max(sec) AS end_ts,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sess ORDER BY user_id, start_ts""".stripMargin,
    // independent implementation: DuckDB's NATIVE ASOF JOIN vs the
    // engine's union-plus-window form (no join operator at all)
    "q_asof_join" ->
      """WITH r0 AS (
        |  SELECT user_id, ts, value, event_id,
        |    row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type = 'purchase'),
        |r AS (SELECT user_id, ts, value, event_id FROM r0 WHERE rn = 1),
        |l AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click')
        |SELECT l.user_id, CAST(floor(epoch(l.ts)) AS BIGINT) AS sec, l.event_id,
        |  COALESCE(CAST(floor(epoch(r.ts)) AS BIGINT), -1) AS ref_sec,
        |  COALESCE(r.event_id, -1) AS ref_event_id,
        |  COALESCE(r.value, -1.0) AS ref_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,
    "q_interval_join" ->
      s"""SELECT a.user_id AS user_id, a.event_id AS view_id, b.event_id AS click_id,
        |  CAST(floor(epoch(b.ts)) AS BIGINT) - CAST(floor(epoch(a.ts)) AS BIGINT) AS lag_sec
        |FROM (SELECT * FROM events WHERE event_type = 'view') a
        |JOIN (SELECT * FROM events WHERE event_type = 'click') b
        |  ON a.user_id = b.user_id AND b.ts >= a.ts
        |  AND b.ts <= a.ts + INTERVAL $IntervalJoinSec SECONDS
        |ORDER BY view_id, click_id""".stripMargin,
    // pivot redone as CASE aggregation, generated from the SAME value
    // list the Spark query pivots on
    "q_pivot" -> {
      val cases = PivotEventTypes.map(t =>
        s"""  CAST(sum(CASE WHEN event_type = '$t' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS "$t"""")
        .mkString(",\n")
      s"SELECT user_id,\n$cases\nFROM events GROUP BY user_id ORDER BY user_id"
    },
    // the unpivot roundtrip collapses to the plain per-(user, type)
    // aggregation — one engine reshapes twice, the other not at all
    "q_unpivot" ->
      """SELECT user_id, event_type,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,
    "q_rollup" ->
      """SELECT lang, source, count(*) AS n,
        |  CAST(GROUPING(lang, source) AS BIGINT) AS gid
        |FROM documents GROUP BY ROLLUP(lang, source)
        |ORDER BY gid, lang, source""".stripMargin,
    "q_cube" ->
      """SELECT lang, source, count(*) AS n,
        |  CAST(GROUPING(lang, source) AS BIGINT) AS gid
        |FROM documents GROUP BY CUBE(lang, source)
        |ORDER BY gid, lang, source""".stripMargin,
    "q_window_range" ->
      s"""SELECT user_id, event_id,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
         |    PARTITION BY user_id ORDER BY epoch(ts)
         |    RANGE BETWEEN $WindowRangeSec PRECEDING AND CURRENT ROW) AS DOUBLE)
         |    AS moving_sum
         |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q_bloom_join" ->
      """SELECT l_orderkey, l_linenumber, p_partkey, p_size
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size >= 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_scd2" ->
      """WITH dim AS (
        |  SELECT c_custkey AS key, c_mktsegment AS seg,
        |    TIMESTAMP '2020-01-01' AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to,
        |    true AS is_current
        |  FROM customer),
        |u AS (
        |  SELECT c_custkey AS key,
        |    CASE WHEN c_custkey % 6 = 0 THEN reverse(c_mktsegment)
        |         ELSE c_mktsegment END AS seg,
        |    TIMESTAMP '2021-06-01' AS ts
        |  FROM customer WHERE c_custkey % 3 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, 'SEGNEW', TIMESTAMP '2021-06-01'
        |  FROM customer WHERE c_custkey % 50 = 0),
        |mapped AS (
        |  SELECT d.key, d.seg, d.valid_from,
        |    CASE WHEN u.key IS NOT NULL AND u.seg <> d.seg
        |         THEN u.ts ELSE d.valid_to END AS valid_to,
        |    NOT (u.key IS NOT NULL AND u.seg <> d.seg) AS is_current
        |  FROM dim d LEFT JOIN u ON d.key = u.key),
        |opened AS (
        |  SELECT u.key, u.seg, u.ts AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to,
        |    true AS is_current
        |  FROM u JOIN dim d ON u.key = d.key AND u.seg <> d.seg
        |  UNION ALL
        |  SELECT u.key, u.seg, u.ts, CAST(NULL AS TIMESTAMP), true
        |  FROM u WHERE NOT EXISTS (SELECT 1 FROM dim d WHERE d.key = u.key))
        |SELECT key, seg, strftime(valid_from, '%Y-%m-%d') AS valid_from,
        |  strftime(valid_to, '%Y-%m-%d') AS valid_to, is_current
        |FROM (SELECT * FROM mapped UNION ALL SELECT * FROM opened) AS m
        |ORDER BY key, valid_from, is_current""".stripMargin,
    "q_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.25), 6) AS p25,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.75), 6) AS p75
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}

package graft

import graft.operators.DsSketches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DsSketchesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"
  private def events = spark.read.parquet(s"$dir/events.parquet")

  // ---- theta ---------------------------------------------------------------

  test("theta exact mode: estimate equals exact distinct count below 2^lgK") {
    val est = DsSketches.thetaSketch(events, Seq("event_type"), "user_id")
      .select(col("event_type"), DsSketches.thetaEstimate(col("sketch")).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, x) => assert(est(k) == x.toDouble, k) }
  }

  test("theta shard-merge invariance: partials unioned == direct sketch, for ANY sharding") {
    val direct = DsSketches.thetaSketch(events, Seq("event_type"), "user_id")
      .select(col("event_type"), DsSketches.thetaEstimate(col("sketch")).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for (shard <- Seq(to_date(col("ts")), pmod(col("event_id"), lit(7)))) {
      val merged = DsSketches.thetaMergeEstimate(
          DsSketches.thetaPartials(events, Seq("event_type"), shard, "user_id"),
          Seq("event_type"))
        .collect().map(r => r.getString(0) -> r.getAs[Double]("est")).toMap
      assert(merged == direct, s"sharded-merge estimate diverged for $shard")
    }
  }

  test("theta set algebra matches exact set algebra in exact mode") {
    // deterministic overlapping cohorts: A = 0..599, B = 400..999
    val df = ((0 until 600).map(i => ("a", i.toLong)) ++
      (400 until 1000).map(i => ("b", i.toLong))).toDF("cohort", "v")
      .repartition(7) // force partial merges across partitions
    val row = DsSketches.thetaCohortSetOps(df, "cohort", "v").collect()
    assert(row.length == 1)
    val r = row.head
    assert(r.getAs[Double]("est_union") == 1000.0)
    assert(r.getAs[Double]("est_intersect") == 200.0)
    assert(r.getAs[Double]("est_diff") == 400.0) // a \ b = 0..399
    // exact mode: bounds collapse onto the estimate
    assert(r.getAs[Double]("lb_union") == 1000.0 && r.getAs[Double]("ub_union") == 1000.0)
  }

  test("theta estimation mode: bounds bracket the truth on 100k distinct values") {
    // 100k >> 2^12 nominal entries — the sketch is genuinely estimating
    val df = (0 until 100000).map(_.toLong).toDF("v").repartition(13)
      .withColumn("g", lit("all"))
    val sk = DsSketches.thetaSketch(df, Seq("g"), "v")
      .select(DsSketches.thetaEstimate(col("sketch")).as("est"),
        DsSketches.thetaLower(col("sketch")).as("lb"),
        DsSketches.thetaUpper(col("sketch")).as("ub")).head()
    val (est, lb, ub) = (sk.getDouble(0), sk.getDouble(1), sk.getDouble(2))
    assert(lb <= 100000.0 && 100000.0 <= ub, s"[$lb, $ub] misses truth (est=$est)")
    assert(math.abs(est - 100000.0) / 100000.0 < 0.10, s"est=$est off by >10%")
  }

  // ---- KLL -----------------------------------------------------------------

  test("KLL exact below k: merged quantiles are exact order statistics") {
    // 150 values < k=200 — the sketch retains everything, so the merged
    // INCLUSIVE quantile is the exact smallest value with rank >= p
    val vals = scala.util.Random.shuffle((1 to 150).toList).map(_.toDouble)
    val df = vals.zipWithIndex.map { case (v, i) => ("g", i % 5, v) }
      .toDF("g", "shard", "v").repartition(5)
    val partials = DsSketches.kllPartials(df, Seq("g"), col("shard"), "v")
    val qs = DsSketches.kllMergedQuantiles(partials, Seq("g"), Seq(0.1, 0.5, 0.9))
      .collect().map(r => r.getAs[Double]("p") -> r.getAs[Double]("est")).toMap
    assert(qs(0.1) == 15.0 && qs(0.5) == 75.0 && qs(0.9) == 135.0, qs.toString)
  }

  test("KLL merged rank check holds on the events table across shardings") {
    for (shard <- Seq(to_date(col("ts")), pmod(col("event_id"), lit(7)))) {
      val est = DsSketches.kllMergedQuantiles(
        DsSketches.kllPartials(events, Seq("event_type"), shard, "value"),
        Seq("event_type"), Seq(0.25, 0.5, 0.75))
      val rows = DsSketches.rankCheck(events, est, Seq("event_type"), "value",
        DsSketches.kllRankEps()).collect()
      assert(rows.length == 15) // 5 types × 3 ps
      assert(rows.forall(_.getAs[Boolean]("rank_ok")),
        rows.filterNot(_.getAs[Boolean]("rank_ok")).mkString("; "))
    }
  }

  // ---- tuple (theta-with-summaries) ------------------------------------------

  test("tuple sketch: exact-mode distinct + per-key value totals, intersection combines") {
    import org.apache.spark.sql.functions.col
    // cohort a: keys 0..299 each appearing TWICE with v=1.0 (per-key sum 2.0)
    // cohort b: keys 200..799 once with v=2.0 — overlap keys 200..299
    val df = ((0 until 600).map(i => ("a", (i % 300).toLong, 1.0)) ++
      (200 until 800).map(i => ("b", i.toLong, 2.0))).toDF("cohort", "u", "v")
      .repartition(7)
    val sk = DsSketches.tupleSketch(df, Seq("cohort"), "u", "v")
    val est = sk.select(col("cohort"),
        DsSketches.tupleEstimate(col("sketch")).as("d"),
        DsSketches.tupleSumEstimate(col("sketch")).as("s"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(est("a") == ((300.0, 600.0)), s"cohort a: ${est("a")}")
    assert(est("b") == ((600.0, 1200.0)), s"cohort b: ${est("b")}")
    // intersection: 100 common keys, each carrying 2.0 (a) + 2.0 (b) = 4.0
    val bySk = sk.collect().map(r =>
      r.getString(0) -> r.getAs[Array[Byte]]("sketch")).toMap
    val inter = DsSketches.tupleIntersectPair(lit(bySk("a")), lit(bySk("b")))
    val r = spark.range(1).select(
      DsSketches.tupleEstimate(inter), DsSketches.tupleSumEstimate(inter)).head()
    assert(r.getDouble(0) == 100.0, s"common keys ${r.getDouble(0)}")
    assert(r.getDouble(1) == 400.0, s"combined sum ${r.getDouble(1)}")
  }

  test("tuple sketch estimation mode: sum/theta estimator tracks the population total") {
    val df = (0 until 100000).map(i => ("all", i.toLong, 1.0)).toDF("g", "u", "v")
      .repartition(13)
    val sk = DsSketches.tupleSketch(df, Seq("g"), "u", "v")
    val r = sk.select(
      DsSketches.tupleEstimate(col("sketch")),
      DsSketches.tupleLower(col("sketch")),
      DsSketches.tupleUpper(col("sketch")),
      DsSketches.tupleSumEstimate(col("sketch"))).head()
    assert(r.getDouble(1) <= 100000.0 && 100000.0 <= r.getDouble(2),
      s"bounds [${r.getDouble(1)}, ${r.getDouble(2)}] miss truth")
    assert(math.abs(r.getDouble(3) - 100000.0) / 100000.0 < 0.10,
      s"sum estimate ${r.getDouble(3)} off by >10%")
  }

  // ---- frequent items --------------------------------------------------------

  test("Misra-Gries: bounds bracket exact counts and nothing heavy is missed") {
    // skewed stream over 32 keys: key 0 gets ~50%, 1 gets ~25%, rest noise;
    // map size 8 < 32 forces eviction so the bounds machinery engages
    val keys = (0 until 20000).map { i =>
      if (i % 2 == 0) 0L else if (i % 4 == 1) 1L else (i % 32).toLong
    }
    val df = keys.toDF("k").repartition(9)
    val bytes = DsSketches.freqSketch(df, col("k"), maxMapSize = 8)
    val items = DsSketches.freqItems(spark, bytes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val exact = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // every reported item's true count within [lb, ub]
    items.foreach { case (item, _, lb, ub) =>
      val x = exact.getOrElse(item, 0L)
      assert(lb <= x && x <= ub, s"item $item: exact=$x outside [$lb,$ub]")
    }
    // NO_FALSE_NEGATIVES: every key above maxError is present
    val threshold = DsSketches.freqMaxError(bytes)
    val reported = items.map(_._1).toSet
    exact.filter(_._2 > threshold).keys.foreach(k =>
      assert(reported.contains(k), s"heavy key $k (exact=${exact(k)}) missed"))
    // the two genuinely heavy keys must be reported with good estimates
    assert(reported.contains(0L) && reported.contains(1L))
  }

  test("freq sketch merges across shards like any partial") {
    // build two shard sketches via the aggregate's binary mode and check
    // the merged heavy-hitter set still contains the global heavy key
    val a = (0 until 5000).map(i => if (i % 2 == 0) 7L else (i % 16).toLong).toDF("k")
    val b = (0 until 5000).map(i => if (i % 3 == 0) 7L else ((i % 16) + 16).toLong).toDF("k")
    DsSketches.register(spark)
    val partials = a.agg(call_function("graft_freq_agg", col("k"), lit(8)).as("s"))
      .union(b.agg(call_function("graft_freq_agg", col("k"), lit(8)).as("s")))
    val merged = partials
      .agg(call_function("graft_freq_agg", col("s"), lit(8)).as("s"))
      .head().getAs[Array[Byte]](0)
    val items = DsSketches.freqItems(spark, merged).as[(Long, Long, Long, Long)].collect()
    assert(items.map(_._1).contains(7L))
    val seven = items.find(_._1 == 7L).get
    val exact7 = 2500L + (0 until 5000).count(_ % 3 == 0)
    // merged bounds still bracket the cross-shard exact count... lb can
    // undershoot after merge but ub >= truth must hold (one-sided MG bound)
    assert(seven._3 <= exact7 && exact7 <= seven._4,
      s"exact=$exact7 outside [${seven._3}, ${seven._4}]")
  }

  // ---- reservoir sampling ------------------------------------------------------

  test("reservoir: below k it retains everything; above k the union stays a valid k-sample") {
    import org.apache.spark.sql.functions.col
    // n < k: the reservoir IS the stream
    val small = (0 until 20).map(i => ("g", i.toLong)).toDF("g", "v").repartition(5)
    val sk1 = DsSketches.reservoirSketch(small, Seq("g"), "v", k = 32)
      .select(DsSketches.reservoirN(col("sketch")),
        DsSketches.reservoirSamples(col("sketch"))).head()
    assert(sk1.getLong(0) == 20L)
    assert(sk1.getSeq[Long](1).sorted == (0L until 20L))
    // n >> k across partitions: n exact, |sample| = k, all real members,
    // no duplicates (the stream had none)
    val big = (0 until 100000).map(i => ("g", i.toLong)).toDF("g", "v").repartition(13)
    val sk2 = DsSketches.reservoirSketch(big, Seq("g"), "v", k = 64)
      .select(DsSketches.reservoirN(col("sketch")),
        DsSketches.reservoirSamples(col("sketch"))).head()
    assert(sk2.getLong(0) == 100000L)
    val samples = sk2.getSeq[Long](1)
    assert(samples.length == 64)
    assert(samples.distinct.length == 64)
    assert(samples.forall(v => v >= 0 && v < 100000))
  }

  // ---- VarOpt weighted sample ---------------------------------------------------

  test("varopt: below k it retains raw weights; above k it preserves total weight and estimates subset sums") {
    import org.apache.spark.sql.functions.col
    // n < k: every (item, weight) retained verbatim
    val small = (1 to 10).map(i => ("g", i.toLong, i.toDouble)).toDF("g", "u", "w")
      .repartition(3)
    val s1 = DsSketches.varoptSketch(small, Seq("g"), "u", "w", k = 32)
      .select(DsSketches.varoptN(col("sketch")),
        DsSketches.varoptSamples(col("sketch"))).head()
    assert(s1.getLong(0) == 10L)
    val retained = s1.getSeq[org.apache.spark.sql.Row](1)
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(retained == (1 to 10).map(i => i.toLong -> i.toDouble).toMap)
    // n >> k across partitions: n exact, size k, total weight preserved,
    // and the subset-sum estimator brackets an exact subset total
    val big = (0 until 50000).map(i => ("g", i.toLong, 1.0 + (i % 7)))
      .toDF("g", "u", "w").repartition(13)
    val bytes = DsSketches.varoptSketch(big, Seq("g"), "u", "w", k = 256)
      .select(col("sketch")).head().getAs[Array[Byte]](0)
    val sk = org.apache.datasketches.sampling.VarOptItemsSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(bytes),
      new org.apache.datasketches.common.ArrayOfLongsSerDe())
    assert(sk.getN == 50000L)
    assert(sk.getNumSamples == 256)
    val exactTotal = (0 until 50000).map(i => 1.0 + (i % 7)).sum
    val total = sk.estimateSubsetSum(_ => true)
    assert(math.abs(total.getTotalSketchWeight - exactTotal) < 1e-6 * exactTotal,
      s"total weight ${total.getTotalSketchWeight} != $exactTotal")
    // unbiased subset estimate: weight of even ids. The library's
    // lb/ub is a ~95 % CONFIDENCE interval over the sketch's own
    // (unseeded, unseedable) randomness, not a sure bound — a 2.5σ draw
    // at k=256 was OBSERVED missing a ±2 %-padded bracket entirely
    // (est 121,873 vs exact 99,997; round-4 verdict), so no single-
    // sketch interval assertion can be deterministic. Instead: average
    // the estimate over 9 INDEPENDENT sketches (σ/3 ≈ 3 % of truth) and
    // assert a ±15 % band (≈ 5σ of the mean — flake odds ~3e-7), plus
    // the SURE per-sketch bound est ≤ total sketch weight.
    val exactEven = (0 until 50000 by 2).map(i => 1.0 + (i % 7)).sum
    val serde = new org.apache.datasketches.common.ArrayOfLongsSerDe()
    val ests = (1 to 9).map { _ =>
      val b = DsSketches.varoptSketch(big, Seq("g"), "u", "w", k = 256)
        .select(col("sketch")).head().getAs[Array[Byte]](0)
      val s = org.apache.datasketches.sampling.VarOptItemsSketch.heapify(
        org.apache.datasketches.memory.Memory.wrap(b), serde)
      val r = s.estimateSubsetSum(l => l % 2 == 0)
      assert(r.getEstimate >= 0.0 &&
          r.getEstimate <= r.getTotalSketchWeight + 1e-6,
        s"subset estimate ${r.getEstimate} outside [0, total] — not a CI, a sure bound")
      r.getEstimate
    }
    val mean = ests.sum / ests.size
    assert(math.abs(mean - exactEven) <= 0.15 * exactEven,
      s"mean of ${ests.size} independent subset estimates $mean " +
        s"misses $exactEven by >15% (ests: $ests)")
  }

  // ---- NULL / empty-group edges (review findings, regression-pinned) ---------

  test("all-NULL groups: reservoir yields an empty sample, KLL a NULL quantile, tuple counts the key") {
    import org.apache.spark.sql.functions.col
    val df = Seq[(String, java.lang.Long, java.lang.Double)](
      ("full", 1L, 5.0), ("full", 2L, 7.0),
      ("hollow", null, null), ("hollow", null, null)
    ).toDF("g", "u", "v").repartition(3)
    // reservoir over an entirely-NULL value column: empty sketch, not an NPE
    val res = DsSketches.reservoirSketch(df, Seq("g"), "u", k = 8)
      .select(col("g"), DsSketches.reservoirN(col("sketch")).as("n"),
        DsSketches.reservoirSamples(col("sketch")).as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[Long](2)))).toMap
    assert(res("hollow") == ((0L, Seq())))
    assert(res("full")._1 == 2L && res("full")._2.sorted == Seq(1L, 2L))
    // KLL over the same: the hollow group's quantile is NULL, the full
    // group's is real — one bad group must not abort the read
    val kll = DsSketches.kllMergedQuantiles(
        DsSketches.kllPartials(df, Seq("g"), lit(0), "v"), Seq("g"), Seq(0.5))
      .collect().map(r => r.getString(0) -> Option(r.get(r.length - 1))).toMap
    assert(kll("hollow").isEmpty)
    assert(kll("full").nonEmpty)
    // tuple: a key whose metric is NULL still counts as a distinct key
    // (summary 0.0) — matching COUNT(DISTINCT key) + SUM(value) SQL
    val tdf = Seq[(String, java.lang.Long, java.lang.Double)](
      ("g", 1L, 3.0), ("g", 2L, null), ("g", 2L, 4.0), ("g", 3L, null)
    ).toDF("g", "u", "v")
    val t = DsSketches.tupleSketch(tdf, Seq("g"), "u", "v")
      .select(DsSketches.tupleEstimate(col("sketch")),
        DsSketches.tupleSumEstimate(col("sketch"))).head()
    assert(t.getDouble(0) == 3.0, s"distinct ${t.getDouble(0)}")
    assert(t.getDouble(1) == 7.0, s"sum ${t.getDouble(1)}")
  }

  // ---- string-item sketches ---------------------------------------------------

  private def docs = spark.read.parquet(s"$dir/documents.parquet")
  // the corpus's raw tokens are near-uniform (no real heavy hitter), so
  // skew the item stream exactly like the query layer does: the upper
  // half of the alphabet collapses into one genuinely heavy bucket
  private def toks = transform(
    regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)),
    t => least(t, lit("m")))

  test("freq strings: array-element updates keep both Misra–Gries guarantees") {
    val bytes = DsSketches.freqStringsSketch(docs, toks, maxMapSize = 8)
    val exact = docs.select(explode(toks).as("t")).groupBy(col("t"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.size > 8, "vocabulary must exceed the map so eviction engages")
    val items = DsSketches.freqStringItems(spark, bytes).collect()
    assert(items.nonEmpty)
    for (r <- items) {
      val t = r.getAs[String]("item")
      assert(r.getAs[Long]("lb") <= exact(t) && exact(t) <= r.getAs[Long]("ub"),
        s"$t: [${r.getAs[Long]("lb")}, ${r.getAs[Long]("ub")}] misses ${exact(t)}")
    }
    // NO_FALSE_NEGATIVES: nothing above maxError may be missing — and the
    // check must be NON-vacuous (at least one item genuinely heavy)
    val reported = items.map(_.getAs[String]("item")).toSet
    val th = DsSketches.freqStringsMaxError(bytes)
    val heavy = exact.filter { case (_, c) => c > th }
    assert(heavy.nonEmpty, s"no item above maxError $th — completeness check vacuous")
    for ((t, c) <- heavy) assert(reported(t), s"heavy '$t' ($c > $th) missed")
  }

  test("freq strings: scalar-string input and binary shard-merge keep the bounds") {
    DsSketches.register(spark)
    val rows = docs.select(explode(toks).as("t"), pmod(col("doc_id"), lit(4)).as("shard"))
    val exact = rows.groupBy(col("t")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // per-shard partials over SCALAR strings, then a binary-mode merge
    val merged = rows.groupBy(col("shard"))
      .agg(call_function("graft_freq_strings_agg", col("t"), lit(8)).as("sketch"))
      .agg(call_function("graft_freq_strings_agg", col("sketch"), lit(8)).as("s"))
      .head().getAs[Array[Byte]](0)
    val items = DsSketches.freqStringItems(spark, merged).collect()
    assert(items.nonEmpty)
    for (r <- items) {
      val t = r.getAs[String]("item")
      assert(r.getAs[Long]("lb") <= exact(t) && exact(t) <= r.getAs[Long]("ub"), t)
    }
    val reported = items.map(_.getAs[String]("item")).toSet
    val th = DsSketches.freqStringsMaxError(merged)
    val heavy = exact.filter { case (_, c) => c > th }
    assert(heavy.nonEmpty, s"no item above maxError $th — completeness check vacuous")
    for ((t, _) <- heavy) assert(reported(t), s"heavy '$t' missed after merge")
  }

  test("KLL strings exact below k: merged split points are exact order statistics") {
    // 150 zero-padded keys < k=200 — lexicographic == numeric order, so
    // the merged INCLUSIVE quantile is the exact smallest key with rank >= p
    val keys = scala.util.Random.shuffle((1 to 150).toList).map(i => f"k$i%03d")
    val df = keys.zipWithIndex.map { case (v, i) => ("g", i % 5, v) }
      .toDF("g", "shard", "v").repartition(5)
    val partials = DsSketches.kllStringsPartials(df, Seq("g"), col("shard"), "v")
    assert(partials.count() == 5)
    val qs = DsSketches.kllStringsMergedQuantiles(partials, Seq("g"), Seq(0.1, 0.5, 0.9))
      .collect().map(r => r.getAs[Double]("p") -> r.getAs[String]("est")).toMap
    assert(qs(0.1) == "k015" && qs(0.5) == "k075" && qs(0.9) == "k135", qs.toString)
  }

  test("KLL strings: NULL-only group survives the merged read as NULL") {
    val df = Seq[(String, java.lang.Integer, String)](
      ("full", 0, "a"), ("full", 1, "b"), ("hollow", 0, null), ("hollow", 1, null)
    ).toDF("g", "shard", "v").repartition(3)
    val qs = DsSketches.kllStringsMergedQuantiles(
        DsSketches.kllStringsPartials(df, Seq("g"), col("shard"), "v"),
        Seq("g"), Seq(0.5))
      .collect().map(r => r.getString(0) -> Option(r.getAs[String]("est"))).toMap
    assert(qs("hollow").isEmpty)
    assert(qs("full").contains("a"))
  }

  test("kllRangeCount: exact below k, bounds bracket the truth above it") {
    // small: the sketch retains all 100 values — est IS the exact count
    val small = (1 to 100).map(i => (i % 4, i.toDouble)).toDF("shard", "v")
    val r1 = DsSketches.kllRangeCount(
      DsSketches.kllPartials(small, Seq.empty, col("shard"), "v"), 25.0, 75.0).head()
    assert(r1.getAs[Long]("n") == 100L && r1.getAs[Long]("n_files") == 4L)
    assert(r1.getAs[Double]("est") == 51.0) // 25..75 inclusive
    assert(r1.getAs[Long]("lb") <= 51L && 51L <= r1.getAs[Long]("ub"))
    // large: 50k values >> k — genuinely estimating, bounds must hold
    val big = (0 until 50000).map(i => (i % 16, (i % 1000).toDouble))
      .toDF("shard", "v").repartition(7)
    val exact = 50000L * 101 / 1000 // v in [200, 300]: 101 of 1000 residues
    val r2 = DsSketches.kllRangeCount(
      DsSketches.kllPartials(big, Seq.empty, col("shard"), "v"), 200.0, 300.0).head()
    assert(r2.getAs[Long]("n") == 50000L)
    assert(r2.getAs[Long]("lb") <= exact && exact <= r2.getAs[Long]("ub"),
      s"[${r2.getAs[Long]("lb")}, ${r2.getAs[Long]("ub")}] misses $exact " +
        s"(est ${r2.getAs[Double]("est")})")
  }

  // ---- binary-mode merge helpers (streaming re-aggregation shape) -----------

  test("tupleMerge: per-shard partials merged == direct sketch (exact mode)") {
    val shards = events.withColumn("shard", pmod(col("event_id"), lit(3)))
    val merged = DsSketches.tupleMerge(
        DsSketches.tupleSketch(shards, Seq("event_type", "shard"), "user_id", "value"),
        Seq("event_type"))
      .select(col("event_type"),
        DsSketches.tupleEstimate(col("sketch")).as("users"),
        DsSketches.tupleSumEstimate(col("sketch")).as("sum"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(merged.keySet == exact.keySet)
    for ((g, (u, sm)) <- exact) {
      assert(merged(g)._1 == u.toDouble, s"$g users")
      assert(math.abs(merged(g)._2 - sm) <= 1e-6 * math.abs(sm) + 1e-6, s"$g sum")
    }
  }

  test("reservoirMerge: merged shard samples stay valid (n exact, size, membership)") {
    val shards = events.withColumn("shard", pmod(col("event_id"), lit(3)))
    val merged = DsSketches.reservoirMerge(
        DsSketches.reservoirSketch(shards, Seq("event_type", "shard"), "event_id"),
        Seq("event_type"))
      .select(col("event_type"), DsSketches.reservoirN(col("sketch")).as("n"),
        DsSketches.reservoirSamples(col("sketch")).as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[Long](2)))).toMap
    val base = events.select(col("event_type"), col("event_id"))
      .collect().groupBy(_.getString(0)).map { case (g, rs) => g -> rs.map(_.getLong(1)).toSet }
    for ((g, ids) <- base) {
      val (n, sample) = merged(g)
      assert(n == ids.size.toLong, s"$g stream length")
      assert(sample.size == math.min(DsSketches.ReservoirK.toLong, n), s"$g size")
      assert(sample.distinct.size == sample.size, s"$g duplicate samples")
      assert(sample.forall(ids), s"$g non-member sample")
    }
  }

  test("varoptMerge: merged weighted samples preserve total weight and membership") {
    val shards = events.withColumn("shard", pmod(col("event_id"), lit(3)))
    val merged = DsSketches.varoptMerge(
        DsSketches.varoptSketch(shards, Seq("event_type", "shard"), "event_id", "value"),
        Seq("event_type"))
      .select(col("event_type"), DsSketches.varoptN(col("sketch")).as("n"),
        DsSketches.varoptTotalWeight(col("sketch")).as("w"),
        DsSketches.varoptSamples(col("sketch")).as("s"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getSeq[org.apache.spark.sql.Row](3)))).toMap
    val exact = events.filter(col("value") > 0).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("w"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val base = events.select(col("event_type"), col("event_id"))
      .collect().groupBy(_.getString(0)).map { case (g, rs) => g -> rs.map(_.getLong(1)).toSet }
    for ((g, (n, w)) <- exact) {
      val (mn, mw, sample) = merged(g)
      assert(mn == n, s"$g stream length")
      assert(math.abs(mw - w) <= 1e-6 * math.abs(w) + 1e-6, s"$g total weight $mw != $w")
      assert(sample.size == math.min(DsSketches.VarOptK.toLong, n), s"$g size")
      assert(sample.forall(r => base(g)(r.getLong(0))), s"$g non-member sample")
    }
  }

  test("ER lang theta metrics: exact mode at small scale, '*' row = global union") {
    val rows = SparkEntry.queries("er_lang_theta")(spark, dir).collect()
    val byLang = rows.map(r => r.getAs[String]("lang") -> r).toMap
    assert(byLang.contains("*") && byLang.size >= 3)
    // below 2^lgK distinct shas the theta sketch is exact: est == exact
    rows.foreach { r =>
      assert(r.getAs[Double]("est") == r.getAs[Long]("exact").toDouble,
        s"theta not exact at sf0.001 for ${r.getAs[String]("lang")}")
    }
    // the union row counts each distinct content once across langs
    val perLang = rows.filter(_.getAs[String]("lang") != "*")
      .map(_.getAs[Long]("exact")).sum
    assert(byLang("*").getAs[Long]("exact") <= perLang)
  }

  test("DsSketchQueries: every query verdict-green at sf0.001") {
    for ((name, fn) <- DsSketchQueries.queries) {
      val rows = fn(spark, dir).collect()
      assert(rows.nonEmpty, s"$name returned 0 rows")
      val verdictCols = rows.head.schema.fieldNames.filter(f =>
        f.endsWith("_ok") || f == "within")
      for (r <- rows; c <- verdictCols)
        assert(r.getAs[Boolean](c), s"$name: $c false in $r")
    }
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage over the candidate pairs
  * (Fellegi & Sunter 1969; EM fitting per Winkler 1988). The reference
  * library has no probabilistic scorer at all (SURVEY.md §3b) — this is
  * the classic ER decision layer the north_rule's category implies,
  * layered on the pipeline's own stages: each scored candidate pair gets
  * a k-field binary comparison vector γ, a two-class latent-mixture
  * model (match M / non-match U) is fitted by EM under conditional
  * independence, and every pair is assigned the log-likelihood-ratio
  * match weight  w(γ) = Σ_j γ_j·log2(m_j/u_j) + (1−γ_j)·log2((1−m_j)/(1−u_j))
  * plus the posterior P(M|γ), thresholded into match / possible /
  * non-match.
  *
  * Scale shape (100 TB): the ONLY driver-side data is the comparison-
  * PATTERN histogram — at most 2^k = 32 rows regardless of corpus size
  * (same bounded-sample discipline as the IVF quantizer). EM runs on
  * that histogram in microseconds; the fitted per-pattern weight table
  * (32 rows) is broadcast back and pair scoring is a broadcast-hash
  * join + codegen'd arithmetic — no extra wide shuffle. Feature
  * attachment is two narrow equi-joins on id (the same AQE-skew-handled
  * shape as the scoring stage's tree fetch, but over five scalar
  * columns, not label arrays).
  *
  * Determinism: fixed init (m=0.9, u=0.1, p=0.1), fixed iteration count,
  * and the E-step computed as exp(Σ ln ·) so the DuckDB oracle can
  * replay the identical arithmetic (ErQueries.fsEmSql generates the
  * same fixed-iteration chain as SQL CTEs).
  */
object FellegiSunter {

  /** γ agreement fields, bit j of the pattern = fieldNames(j).
    *
    * Field choice matters: the assessment pair set must contain BOTH
    * mixture classes and every field must vary across it, or EM has
    * nothing to separate (a field that never fires fits m ≈ u ≈ clamp
    * and contributes weight 0). The query layer therefore fits over
    * LSH candidates ∪ sorted-neighborhood pairs — the SNM channel
    * supplies size-similar true NON-matches — and the fields below all
    * discriminate on that set. `name_eq` is deliberately kept although
    * it is NEGATIVELY informative on the synthetic corpus (same-group
    * members always carry different member filenames, so m₃ < u₃):
    * Fellegi–Sunter handles that with a negative agreement weight, and
    * it exercises exactly that path. */
  val fieldNames: Seq[String] =
    Seq("ted_close", "size_close", "tokens_close", "name_eq", "lang_eq")
  val k: Int = fieldNames.length

  /** normDist agreement bound for γ0 — intentionally TIGHTER than the
    * pipeline's match band (tau = 0.08) so the field carries information
    * the sha-equality field doesn't already imply. */
  val TedAgree = 0.04

  /** Relative size-agreement bound for γ1/γ2, as an exact integer
    * predicate (10·|a−b| ≤ max(a,b) ⟺ |a−b| ≤ 0.1·max) so the oracle
    * can never drift on float rounding. */
  val SizeRelTenths = 10

  val EmIters = 20
  val ClampEps = 1e-6
  val PosteriorMatch = 0.95
  val PosteriorNonMatch = 0.05

  final case class FsParams(m: Array[Double], u: Array[Double], p: Double) {
    require(m.length == k && u.length == k)
  }

  /** Narrow per-pair feature table: scored pairs joined with the five
    * scalar attributes of each side. This exact frame is dumped as
    * `_aux/fs_pairs` so the DuckDB oracle re-derives vectors, EM fit,
    * weights and eval from it independently. */
  def pairFeatures(scores: DataFrame, trees: DataFrame): DataFrame = {
    def side(s: String) = trees.select(
      col("id").as(s"id$s"), col("nTokens").as(s"tok$s"),
      col("path").as(s"path$s"), col("lang").as(s"lang$s"),
      col("groupId").as(s"gid$s"))
    scores
      .select(col("idA"), col("idB"), col("normDist"), col("nA"), col("nB"))
      .join(side("A"), Seq("idA"))
      .join(side("B"), Seq("idB"))
      .select(col("idA"), col("idB"), col("normDist"), col("nA"), col("nB"),
        col("tokA"), col("tokB"), col("pathA"), col("pathB"),
        col("langA"), col("langB"), col("gidA"), col("gidB"))
  }

  /** Comparison vectors: γ bits g0..g4 plus the packed integer pattern.
    * Pure codegen'd column arithmetic — integer predicates where a
    * relative bound is involved, so no float boundary exists. */
  def vectors(features: DataFrame): DataFrame = {
    def bit(c: org.apache.spark.sql.Column) = when(c, 1).otherwise(0)
    features
      .withColumn("g0", bit(col("normDist") <= lit(TedAgree)))
      .withColumn("g1",
        bit(lit(SizeRelTenths) * abs(col("nA") - col("nB")) <= greatest(col("nA"), col("nB"))))
      .withColumn("g2",
        bit(lit(SizeRelTenths) * abs(col("tokA") - col("tokB")) <= greatest(col("tokA"), col("tokB"))))
      .withColumn("g3",
        bit(element_at(split(col("pathA"), "/"), -1) === element_at(split(col("pathB"), "/"), -1)))
      .withColumn("g4", bit(col("langA") === col("langB")))
      .withColumn("pattern",
        col("g0") + col("g1") * 2 + col("g2") * 4 + col("g3") * 8 + col("g4") * 16)
  }

  private def clamp(x: Double): Double =
    math.min(math.max(x, ClampEps), 1.0 - ClampEps)

  /** EM fit over the pattern histogram. The histogram (≤ 2^k rows) is
    * the only data collected to the driver; iteration arithmetic
    * mirrors the oracle's generated SQL exactly: likelihoods via
    * exp(Σ ln ·), clamping via min(max(·)), fixed iteration count. */
  def fitEm(vectors: DataFrame, iters: Int = EmIters): FsParams = {
    val hist = vectors.groupBy(col("pattern")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    fitEmHistogram(hist, iters)
  }

  def fitEmHistogram(hist: Array[(Int, Long)], iters: Int = EmIters): FsParams = {
    var m = Array.fill(k)(0.9)
    var u = Array.fill(k)(0.1)
    var p = 0.1
    var it = 0
    while (it < iters) {
      // E-step: posterior per pattern
      val g = hist.map { case (pat, cnt) =>
        var sm = 0.0; var su = 0.0
        var j = 0
        while (j < k) {
          val agree = ((pat >> j) & 1) == 1
          sm += math.log(if (agree) m(j) else 1.0 - m(j))
          su += math.log(if (agree) u(j) else 1.0 - u(j))
          j += 1
        }
        val pm = math.exp(sm); val pu = math.exp(su)
        (pat, cnt, p * pm / (p * pm + (1.0 - p) * pu))
      }
      // M-step
      val nm = Array.fill(k)(0.0); val nu = Array.fill(k)(0.0)
      var dm = 0.0; var du = 0.0; var gc = 0.0; var tot = 0.0
      g.foreach { case (pat, cnt, gi) =>
        val c = cnt.toDouble
        var j = 0
        while (j < k) {
          val bit = ((pat >> j) & 1).toDouble
          nm(j) += gi * c * bit
          nu(j) += (1.0 - gi) * c * bit
          j += 1
        }
        dm += gi * c; du += (1.0 - gi) * c
        gc += gi * c; tot += c
      }
      m = Array.tabulate(k)(j => clamp(nm(j) / dm))
      u = Array.tabulate(k)(j => clamp(nu(j) / du))
      p = clamp(gc / tot)
      it += 1
    }
    FsParams(m, u, p)
  }

  /** Index of the filename-equality field — the target of the
    * value-specific weights ([[valueWeights]]). */
  val NameField: Int = fieldNames.indexOf("name_eq")

  /** Frequency-based (value-specific) agreement weights — Fellegi &
    * Sunter 1969 §3.3.1's value-dependent u, Winkler 1988's
    * "frequency-based matching": agreeing on a RARE filename is
    * stronger evidence than agreeing on a common one, which one flat
    * per-field u cannot express. For candidate pairs agreeing on
    * filename v:
    *   u_v = C(freq(v), 2) / C(N, 2) = freq·(freq−1) / (N·(N−1))
    * (the exact chance-agreement probability from corpus counts;
    * agreement implies freq ≥ 2, so u_v > 0) and
    *   w_value = log2(m_name / u_v),
    * with m_name the EM-fitted field m (match-class agreement taken as
    * value-independent — the standard approximation). The flat field
    * weight log2(m/u) rides along for comparison. Scale shape: the
    * frequency table is ONE narrow record-grain groupBy; N is a single
    * scalar; the pair⋈freq join keys on the agreed name, whose heavy
    * values are exactly what the upstream blocking cap bounds. */
  def valueWeights(features: DataFrame, trees: DataFrame, params: FsParams): DataFrame = {
    val nameOf = (c: org.apache.spark.sql.Column) => element_at(split(c, "/"), -1)
    val freq = trees.select(nameOf(col("path")).as("name"))
      .groupBy(col("name")).agg(count(lit(1)).as("freq"))
    val n = trees.count() // one scalar — metadata-sized driver data
    val totPairs = (n * (n - 1L)).toDouble
    val m = params.m(NameField); val u = params.u(NameField)
    val ln2 = math.log(2.0)
    features
      .where(nameOf(col("pathA")) === nameOf(col("pathB")))
      .select(col("idA"), col("idB"), nameOf(col("pathA")).as("name"))
      .join(freq, "name")
      .withColumn("u_v",
        (col("freq") * (col("freq") - lit(1L))).cast("double") / lit(totPairs))
      .select(col("idA"), col("idB"), col("name"), col("freq"),
        round(col("u_v"), 9).as("u_v"),
        round(log(lit(m) / col("u_v")) / lit(ln2), 6).as("w_value"),
        round(lit(math.log(m / u) / ln2), 6).as("w_flat"))
  }

  /** Per-(pattern, field) log2-likelihood-ratio contribution — the
    * explain decomposition behind er_fs_explain ("why did these two
    * match?"). The k contributions of a pattern sum to
    * [[patternTable]]'s weight (up to float association — each term
    * here divides by ln 2 individually; the spec pins the equality at
    * 1e-9). 2^k·k rows regardless of corpus size — driver-side tiny. */
  def contributionTable(params: FsParams): Seq[(Int, Int, String, Int, Double)] = {
    val ln2 = math.log(2.0)
    for { pat <- 0 until (1 << k); j <- 0 until k } yield {
      val agree = (pat >> j) & 1
      val c =
        if (agree == 1) math.log(params.m(j) / params.u(j)) / ln2
        else math.log((1.0 - params.m(j)) / (1.0 - params.u(j))) / ln2
      (pat, j, fieldNames(j), agree, c)
    }
  }

  /** All-2^k-pattern decision table: (pattern, weight, posterior,
    * decision) computed driver-side from the fitted params — the 32-row
    * broadcast side of pair scoring. Weight is the base-2 log-likelihood
    * ratio; decision thresholds apply to the ROUNDED posterior so the
    * oracle's recomputation can never flip on a final-ulp difference. */
  def patternTable(params: FsParams): Seq[(Int, Double, Double)] = {
    // sum the ln terms first, divide by ln 2 once — the same arithmetic
    // shape the oracle's SQL uses (sum(...)/ln(2)), so the two sides
    // differ only by float summation order (absorbed by round-6)
    val ln2 = math.log(2.0)
    (0 until (1 << k)).map { pat =>
      var wsum = 0.0; var sm = 0.0; var su = 0.0
      var j = 0
      while (j < k) {
        val agree = ((pat >> j) & 1) == 1
        wsum +=
          (if (agree) math.log(params.m(j) / params.u(j))
           else math.log((1.0 - params.m(j)) / (1.0 - params.u(j))))
        sm += math.log(if (agree) params.m(j) else 1.0 - params.m(j))
        su += math.log(if (agree) params.u(j) else 1.0 - params.u(j))
        j += 1
      }
      val pm = math.exp(sm); val pu = math.exp(su)
      val post = params.p * pm / (params.p * pm + (1.0 - params.p) * pu)
      (pat, wsum / ln2, post)
    }
  }

  /** Target error rates for the optimal decision rule: μ bounds the
    * false-match rate P(declare match | U), λ the false-non-match rate
    * P(declare non-match | M). */
  val TargetMu = 0.001
  val TargetLambda = 0.01

  /** The Fellegi–Sunter OPTIMAL decision rule (F&S 1969, Theorem 1):
    * order patterns by likelihood ratio descending; the match region is
    * the largest prefix whose accumulated u-mass stays ≤ μ, the
    * non-match region the largest suffix whose accumulated m-mass stays
    * ≤ λ, and the (provably minimal) clerical-review region is what's
    * left in between. Returns one row per pattern in rule order:
    * (ord, pattern, weight, mProb, uProb, cumU, cumMDown, region).
    *
    * Ordering uses the ROUNDED weight (6 dp) with the pattern id as the
    * tie-break so the DuckDB oracle's window ordering is identical; the
    * cumulative sums accumulate full-precision probabilities in that
    * same total order. Driver-side over ≤ 2^k = 32 rows — the same
    * bounded-histogram discipline as the EM fit itself. */
  def thresholdTable(
      params: FsParams,
      mu: Double = TargetMu,
      lambda: Double = TargetLambda): Seq[(Int, Int, Double, Double, Double, Double, Double, String)] = {
    val base = patternTable(params).map { case (pat, w, _) =>
      var sm = 0.0; var su = 0.0
      var j = 0
      while (j < k) {
        val agree = ((pat >> j) & 1) == 1
        sm += math.log(if (agree) params.m(j) else 1.0 - params.m(j))
        su += math.log(if (agree) params.u(j) else 1.0 - params.u(j))
        j += 1
      }
      (pat, math.round(w * 1e6) / 1e6, math.exp(sm), math.exp(su))
    }
    val ordered = base.sortBy { case (pat, w6, _, _) => (-w6, pat) }
    val cumU = ordered.scanLeft(0.0)(_ + _._4).tail
    val cumMDown = ordered.scanRight(0.0)(_._3 + _).init
    ordered.zipWithIndex.map { case ((pat, w6, pm, pu), i) =>
      val region =
        if (cumU(i) <= mu) "match"
        else if (cumMDown(i) <= lambda) "nonmatch"
        else "possible"
      (i + 1, pat, w6, pm, pu, cumU(i), cumMDown(i), region)
    }
  }

  /** Attach weight / posterior / decision to every vector row via a
    * broadcast join against the 32-row pattern table. */
  def weigh(spark: SparkSession, vectors: DataFrame, params: FsParams): DataFrame = {
    import spark.implicits._
    val tbl = patternTable(params)
      .toDF("pattern", "w_raw", "post_raw")
      .select(col("pattern"),
        round(col("w_raw"), 6).as("weight"),
        round(col("post_raw"), 6).as("posterior"))
      .withColumn("decision",
        when(col("posterior") >= lit(PosteriorMatch), "match")
          .when(col("posterior") <= lit(PosteriorNonMatch), "nonmatch")
          .otherwise("possible"))
    vectors.join(broadcast(tbl), Seq("pattern"))
  }

  // ---- missing-data (ternary γ) extension ----------------------------
  // Real comparison vectors have a third outcome: the field VALUE IS
  // ABSENT on one side (a source that never captured it, a null, free
  // text). The Fellegi–Sunter treatment (F&S 1969 §3; Christen 2012
  // §6.2): a missing field is EXCLUDED from the likelihood product
  // (evidence absent is not evidence of absence), contributes weight 0
  // to the decision, and is excluded from BOTH numerator and denominator
  // of its field's m/u estimates — so each field keeps its own observed
  // mass in the M-step instead of the binary fit's shared denominator.

  /** Ternary code values: 0 disagree, 1 agree, 2 missing; patterns pack
    * base-3 (pattern = Σ c_j·3^j < 3^k = 243). */
  val CodeMissing = 2
  private[graft] val pow3: Array[Int] = Array.iterate(1, k + 1)(_ * 3)

  /** Ternary comparison vectors over the SAME dumped feature table the
    * binary layer uses, with deterministic missingness channels —
    * integer predicates only, mirrored verbatim by the oracle SQL: the
    * size field is unobserved when either side's node count ≡ 0 (mod 7),
    * the name field when the two path lengths sum ≡ 0 (mod 5), the lang
    * field when the token counts sum ≡ 0 (mod 3). ted/tokens stay
    * always-observed so the mixture stays separable under any draw. */
  def vectorsMissing(features: DataFrame): DataFrame = {
    def code(miss: org.apache.spark.sql.Column, agree: org.apache.spark.sql.Column) =
      when(miss, lit(CodeMissing)).otherwise(when(agree, 1).otherwise(0))
    features
      .withColumn("c0", code(lit(false), col("normDist") <= lit(TedAgree)))
      .withColumn("c1", code(
        pmod(col("nA"), lit(7)) === 0 || pmod(col("nB"), lit(7)) === 0,
        lit(SizeRelTenths) * abs(col("nA") - col("nB")) <= greatest(col("nA"), col("nB"))))
      .withColumn("c2", code(lit(false),
        lit(SizeRelTenths) * abs(col("tokA") - col("tokB")) <= greatest(col("tokA"), col("tokB"))))
      .withColumn("c3", code(
        pmod(length(col("pathA")) + length(col("pathB")), lit(5)) === 0,
        element_at(split(col("pathA"), "/"), -1) === element_at(split(col("pathB"), "/"), -1)))
      .withColumn("c4", code(
        pmod(col("tokA") + col("tokB"), lit(3)) === 0,
        col("langA") === col("langB")))
      .withColumn("pattern",
        col("c0") + col("c1") * 3 + col("c2") * 9 + col("c3") * 27 + col("c4") * 81)
  }

  def fitEmTernary(vectors: DataFrame, iters: Int = EmIters): FsParams = {
    val hist = vectors.groupBy(col("pattern")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    fitEmTernaryHistogram(hist, iters)
  }

  /** EM over the ternary pattern histogram (≤ 3^k rows driver-side —
    * the same bounded-histogram discipline as the binary fit, identical
    * init/clamp/exp(Σ ln ·) arithmetic). Digit 2 contributes factor 1 to
    * both class likelihoods and is absent from its field's M-step
    * masses. On a histogram with no missing digit anywhere this reduces
    * EXACTLY to [[fitEmHistogram]] (per-field denominators all equal the
    * shared one) — pinned by FellegiSunterSpec. */
  def fitEmTernaryHistogram(hist: Array[(Int, Long)], iters: Int = EmIters): FsParams = {
    var m = Array.fill(k)(0.9)
    var u = Array.fill(k)(0.1)
    var p = 0.1
    var it = 0
    while (it < iters) {
      val g = hist.map { case (pat, cnt) =>
        var sm = 0.0; var su = 0.0
        var j = 0
        while (j < k) {
          (pat / pow3(j)) % 3 match {
            case 1 => sm += math.log(m(j)); su += math.log(u(j))
            case 0 => sm += math.log(1.0 - m(j)); su += math.log(1.0 - u(j))
            case _ => () // missing: excluded from the product
          }
          j += 1
        }
        val pm = math.exp(sm); val pu = math.exp(su)
        (pat, cnt, p * pm / (p * pm + (1.0 - p) * pu))
      }
      val nm = Array.fill(k)(0.0); val nu = Array.fill(k)(0.0)
      val dm = Array.fill(k)(0.0); val du = Array.fill(k)(0.0)
      var gc = 0.0; var tot = 0.0
      g.foreach { case (pat, cnt, gi) =>
        val c = cnt.toDouble
        var j = 0
        while (j < k) {
          val d = (pat / pow3(j)) % 3
          if (d != CodeMissing) {
            dm(j) += gi * c; du(j) += (1.0 - gi) * c
            if (d == 1) { nm(j) += gi * c; nu(j) += (1.0 - gi) * c }
          }
          j += 1
        }
        gc += gi * c; tot += c
      }
      // a field missing in every pattern (or starved of a class by a
      // degenerate posterior) has zero M-step mass — its ratio would be
      // NaN, which clamp's min/max passes through. Such a field carries
      // no evidence this iteration; keep its current estimate instead.
      m = Array.tabulate(k)(j => if (dm(j) > 0) clamp(nm(j) / dm(j)) else m(j))
      u = Array.tabulate(k)(j => if (du(j) > 0) clamp(nu(j) / du(j)) else u(j))
      p = clamp(gc / tot)
      it += 1
    }
    FsParams(m, u, p)
  }

  /** All-3^k-pattern decision table — missing digits contribute weight 0
    * and likelihood factor 1; otherwise [[patternTable]]'s arithmetic. */
  def patternTableTernary(params: FsParams): Seq[(Int, Double, Double)] = {
    val ln2 = math.log(2.0)
    (0 until pow3(k)).map { pat =>
      var wsum = 0.0; var sm = 0.0; var su = 0.0
      var j = 0
      while (j < k) {
        (pat / pow3(j)) % 3 match {
          case 1 =>
            wsum += math.log(params.m(j) / params.u(j))
            sm += math.log(params.m(j)); su += math.log(params.u(j))
          case 0 =>
            wsum += math.log((1.0 - params.m(j)) / (1.0 - params.u(j)))
            sm += math.log(1.0 - params.m(j)); su += math.log(1.0 - params.u(j))
          case _ => ()
        }
        j += 1
      }
      val pm = math.exp(sm); val pu = math.exp(su)
      val post = params.p * pm / (params.p * pm + (1.0 - params.p) * pu)
      (pat, wsum / ln2, post)
    }
  }

  /** [[weigh]] for ternary vectors: broadcast join against the 243-row
    * ternary pattern table (same rounded-posterior decision rule). */
  def weighTernary(spark: SparkSession, vectors: DataFrame, params: FsParams): DataFrame = {
    import spark.implicits._
    val tbl = patternTableTernary(params)
      .toDF("pattern", "w_raw", "post_raw")
      .select(col("pattern"),
        round(col("w_raw"), 6).as("weight"),
        round(col("post_raw"), 6).as("posterior"))
      .withColumn("decision",
        when(col("posterior") >= lit(PosteriorMatch), "match")
          .when(col("posterior") <= lit(PosteriorNonMatch), "nonmatch")
          .otherwise("possible"))
    vectors.join(broadcast(tbl), Seq("pattern"))
  }

  /** Pair-level confusion + precision/recall/F1 of the FS 'match'
    * decision against ground-truth labels (same groupId) — decision
    * quality over the CANDIDATE pairs (blocking recall is measured
    * separately by er_blocking_recall). */
  def evalDecisions(weighted: DataFrame): DataFrame = {
    val truth = col("gidA") === col("gidB")
    val pred = col("decision") === "match"
    weighted.agg(
      count(when(truth && pred, 1)).as("tp"),
      count(when(!truth && pred, 1)).as("fp"),
      count(when(truth && !pred, 1)).as("fn"),
      count(when(!truth && !pred, 1)).as("tn"))
      .withColumn("precision",
        round(col("tp").cast("double") / (col("tp") + col("fp")), 6))
      .withColumn("recall",
        round(col("tp").cast("double") / (col("tp") + col("fn")), 6))
      .withColumn("f1",
        round(lit(2.0) * col("tp") / (lit(2.0) * col("tp") + col("fp") + col("fn")), 6))
  }
}

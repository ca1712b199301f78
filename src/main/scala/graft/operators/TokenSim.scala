package graft.operators

import graft.functions.JaroWinkler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-grain hybrid string comparators of the record-linkage
  * literature, over the shared `[a-z0-9]+` lowercase tokenizer (the
  * same one the text-analysis oracle family uses, so DuckDB re-derives
  * identical token arrays):
  *
  *  - TF-IDF cosine (the basis of SoftTFIDF, Cohen/Ravikumar/Fienberg
  *    IIWeb'03): corpus-level IDF weights, raw term counts, sparse dot
  *    product over shared tokens only.
  *  - Monge–Elkan (Monge & Elkan KDD'96): mean-of-max hybrid with a
  *    secondary character-level similarity — here the native
  *    Jaro–Winkler expression — evaluated entirely inside codegen'd
  *    higher-order array functions (no UDF, no explode).
  *
  * Scale shape (10^12-row rationale):
  *  - the TF table is narrow (id, token, weight) and the pair dot
  *    product is a sparse-vector join: pairs ⋈ tf on idA (shuffle on
  *    id), then ⋈ tf on (idB, token) — only SHARED tokens survive the
  *    second join, so the shuffle carries |pairs|·|avg tokens| narrow
  *    rows, never dense vectors. Norms are a per-id aggregate joined
  *    back (broadcast-able: one row per distinct pair member).
  *  - IDF is one groupBy over exploded tokens + a scalar doc count —
  *    the same two-shuffle shape as the BM25 stage.
  *  - Monge–Elkan is a pure per-row scalar over two bounded token
  *    arrays (capped upstream), fully inside whole-stage codegen.
  */
object TokenSim {

  /** The shared cross-engine tokenizer. */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  /** Soft-TF-IDF acceptance threshold θ (Cohen et al. use 0.9) — ONE
    * definition; the oracle SQL interpolates it. */
  val SoftTfIdfTheta = 0.9

  /** TF-IDF cosine over candidate pairs.
    *
    * docs: (id, toks); pairs: (idA, idB). Returns
    * (idA, idB, shared_tokens, cosine) with cosine rounded to 6 dp
    * (the cross-engine float-boundary convention).
    *
    * Weights: w(d, t) = tf(d, t) · ln(N / df(t)) — raw counts, natural
    * log, zero weight for corpus-universal tokens. Pairs whose members
    * share no positive-weight token get cosine 0.0 (kept, so the row
    * set is exactly the input pair set).
    */
  def tfidfCosine(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val n = docs.count() // one scalar: the corpus doc count
    val tf = docs
      .select(col("id"), explode(col("toks")).as("token"))
      .groupBy(col("id"), col("token"))
      .agg(count(lit(1)).as("cnt"))
    val df = tf.groupBy(col("token"))
      .agg(countDistinct(col("id")).as("df"))
    val w = tf.join(df, "token")
      .select(col("id"), col("token"),
        (col("cnt") * log(lit(n.toDouble) / col("df"))).as("w"))
      .where(col("w") > 0)
    val norm = w.groupBy(col("id"))
      .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val dot = pairs
      .join(w.select(col("id").as("idA"), col("token"), col("w").as("wA")), Seq("idA"))
      .join(w.select(col("id").as("idB"), col("token"), col("w").as("wB")),
        Seq("idB", "token"))
      .groupBy(col("idA"), col("idB"))
      .agg(count(lit(1)).as("shared_tokens"), sum(col("wA") * col("wB")).as("dot"))
    pairs
      .join(dot, Seq("idA", "idB"), "left")
      .join(norm.select(col("id").as("idA"), col("nrm").as("nrmA")), Seq("idA"), "left")
      .join(norm.select(col("id").as("idB"), col("nrm").as("nrmB")), Seq("idB"), "left")
      .select(col("idA"), col("idB"),
        coalesce(col("shared_tokens"), lit(0L)).as("shared_tokens"),
        round(coalesce(
          col("dot") / (col("nrmA") * col("nrmB")), lit(0.0)), 6).as("cosine"))
  }

  /** Per-doc L2-NORMALIZED tf-idf weight lists for [[softTfIdf]]:
    * (id, wl) with wl a token-sorted array of struct(t, v), v = w/‖w‖.
    * EVERY input id gets a row (empty array when no token has positive
    * weight), so pair joins never silently drop a member. Same
    * tf/df/weight definitions as [[tfidfCosine]]. */
  def softWeightLists(docs: DataFrame): DataFrame = {
    val n = docs.count() // one scalar: the corpus doc count
    val tf = docs
      .select(col("id"), explode(col("toks")).as("token"))
      .groupBy(col("id"), col("token"))
      .agg(count(lit(1)).as("cnt"))
    val df = tf.groupBy(col("token"))
      .agg(countDistinct(col("id")).as("df"))
    val w = tf.join(df, "token")
      .select(col("id"), col("token"),
        (col("cnt") * log(lit(n.toDouble) / col("df"))).as("w"))
      .where(col("w") > 0)
    val nrm = w.groupBy(col("id")).agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val lists = w.join(nrm, "id")
      .groupBy(col("id"))
      .agg(sort_array(collect_list(
        struct(col("token").as("t"), (col("w") / col("nrm")).as("v")))).as("wl"))
    docs.select(col("id")).join(lists, Seq("id"), "left")
      .select(col("id"), coalesce(col("wl"),
        array().cast("array<struct<t:string,v:double>>")).as("wl"))
  }

  /** Soft-TF-IDF directed similarity (Cohen, Ravikumar, Fienberg,
    * IIWeb 2003 — the most-cited HYBRID measure of the name-matching
    * comparison): tokens of A whose best Jaro–Winkler partner in B
    * clears θ contribute V(w,A)·V(partner,B)·jw — tf-idf weighting
    * with character-level fuzziness inside the token match.
    *
    * `tA`/`tB` are [[softWeightLists]] arrays. The inner jw is ROUNDED
    * to 6 dp before the θ comparison and the product (the established
    * cross-engine float-boundary convention — er_jaro_winkler proved
    * round-6 equality against DuckDB's independent implementation, so
    * the acceptance set is bit-stable across engines). The argmax is a
    * struct max over (jw, partner weight, partner token) — a total
    * order, so ties break identically everywhere. Pure codegen'd
    * higher-order array functions; empty sides contribute 0. */
  def softTfIdf(tA: Column, tB: Column, theta: Double = SoftTfIdfTheta): Column = {
    val contrib = transform(tA, a => {
      val best = array_max(transform(tB, b => struct(
        round(JaroWinkler.jaroWinklerSim(a("t"), b("t")), 6).as("jw"),
        b("v").as("vb"), b("t").as("tb"))))
      when(best("jw") >= theta, a("v") * best("vb") * best("jw"))
        .otherwise(lit(0.0))
    })
    round(aggregate(contrib, lit(0.0), (acc, x) => acc + x), 6)
  }

  /** Monge–Elkan directed similarity me(a→b) = mean over x∈a of
    * max over y∈b of jw(x, y), as a pure Column over two token arrays
    * (the native Jaro–Winkler expression inside transform/array_max —
    * all codegen'd). Caller guarantees both arrays non-empty. */
  def mongeElkan(tA: Column, tB: Column): Column = {
    val best = transform(tA, x =>
      array_max(transform(tB, y => JaroWinkler.jaroWinklerSim(x, y))))
    aggregate(best, lit(0.0), (acc, v) => acc + v) / size(tA).cast("double")
  }
}

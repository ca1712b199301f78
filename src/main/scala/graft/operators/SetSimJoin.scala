package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT set-similarity self-join via prefix filtering (Chaudhuri et al.
  * ICDE'06 SSJoin / Bayardo et al. WWW'07 All-Pairs — public papers):
  * all pairs with token-set Jaccard ≥ tNum/tDen, with NO false negatives
  * — the exact complement to the MinHash/SimHash approximate near-dup
  * family.
  *
  * The prefix-filter theorem: order every token set by ONE global total
  * order and keep each set's first |x| − ⌈t·|x|⌉ + 1 tokens; any pair
  * with Jaccard ≥ t must share ≥ 1 prefix token (overlap ≥ ⌈t·|x|⌉ and
  * ⌈t·|y|⌉, so by pigeonhole the prefixes intersect). Rare-first
  * ordering makes prefixes the globally rarest tokens, so prefix blocks
  * stay small without any cap — exactness is preserved.
  *
  * Scale shape (10^12-row rationale):
  *  - token frequencies: one narrow groupBy over exploded tokens;
  *  - rare-first re-assembly: one equi-join token→freq (shuffle on the
  *    token column, narrow rows) + one per-doc aggregate;
  *  - candidate generation: grouped per-prefix-token pair emission (the
  *    capped-block algebra, uncapped — block size is bounded by the
  *    prefix token's global frequency, which rare-first ordering keeps
  *    minimal) with the length filter tDen·min(|x|,|y|) ≥ tNum·max
  *    applied BEFORE the distinct;
  *  - verification: one join back to the token arrays, exact Jaccard as
  *    codegen'd array_intersect/array_union — integer-exact threshold
  *    (i·tDen ≥ u·tNum), no float boundary between engines.
  */
object SetSimJoin {

  /** ⌈(n·tNum)/tDen⌉ in exact integer Column arithmetic. */
  private def ceilFrac(n: Column, tNum: Int, tDen: Int): Column =
    floor((n * tNum + lit(tDen - 1)) / tDen).cast("int")

  /** Per-doc token arrays re-assembled in the global rare-first total
    * order (freq asc, token asc) — the ONE ordering every prefix filter
    * here keys its correctness on, so it has exactly one definition.
    * PUBLIC so a caller running several joins over the same corpus can
    * build it once, persist it, and feed the `*Ordered` variants (the
    * tokenize → global-frequency → reorder chain is the shuffle-heavy
    * shared stage; TextQueries.SetSimResults memoizes it per corpus).
    * NOT persisted here: the operators return lazy plans and own no
    * lifetime, so pinning a cache inside would leak one copy per
    * invocation (callers that read a result repeatedly should cache the
    * RESULT). Each operator's prefix branch and verification join read
    * this subtree once; Catalyst's exchange reuse covers the overlap. */
  def rareFirst(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("id"), explode(col("toks")).as("token"))
    val freq = tok.groupBy(col("token")).agg(count(lit(1)).as("freq"))
    tok.join(freq, "token")
      .groupBy(col("id"))
      .agg(transform(array_sort(collect_list(struct(col("freq"), col("token")))),
        s => s("token")).as("toks"))
  }

  /** docs: (id, toks) with toks a DISTINCT token array. Returns
    * (idA, idB, isect, union_n, jaccard) for every pair with
    * Jaccard ≥ tNum/tDen — exact, no false negatives/positives. */
  def join(docs: DataFrame, tNum: Int, tDen: Int): DataFrame =
    joinOrdered(rareFirst(docs), tNum, tDen)

  /** [[join]] over an already [[rareFirst]]-ordered (and typically
    * persisted) frame. */
  def joinOrdered(ordered: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen, "threshold must be in (0, 1]")
    val n = size(col("toks"))
    val pfxLen = n - ceilFrac(n, tNum, tDen) + 1
    val prefix = ordered.select(col("id"), n.as("n"),
      explode(slice(col("toks"), lit(1), pfxLen)).as("token"))
    val cands = prefix.groupBy(col("token"))
      .agg(sort_array(collect_set(struct(col("id"), col("n")))).as("ms"))
      .where(size(col("ms")) >= 2)
      // length filter INSIDE the emission: Jaccard ≥ t ⇒ min ≥ t·max,
      // so filtered pairs never materialize before the distinct
      .select(explode(CandidateGen.pairwise(col("ms"),
        (x, y) => struct(x("id").as("idA"), y("id").as("idB")),
        (x, y) => least(x("n"), y("n")) * tDen >= greatest(x("n"), y("n")) * tNum))
        .as("p"))
      .select(col("p.idA"), col("p.idB"))
      .distinct()
    val slim = ordered.select(col("id"), col("toks"))
    cands
      .join(slim.withColumnRenamed("id", "idA").withColumnRenamed("toks", "tA"), "idA")
      .join(slim.withColumnRenamed("id", "idB").withColumnRenamed("toks", "tB"), "idB")
      .select(col("idA"), col("idB"),
        size(array_intersect(col("tA"), col("tB"))).as("isect"),
        size(array_union(col("tA"), col("tB"))).as("union_n"))
      .where(col("isect") * tDen >= col("union_n") * tNum)
      .select(col("idA"), col("idB"), col("isect"), col("union_n"),
        round(col("isect").cast("double") / col("union_n"), 6).as("jaccard"))
  }

  /** PPJoin (Xiao et al., "Efficient Similarity Joins for Near-Duplicate
    * Detection", WWW'08 — public paper): [[join]]'s prefix filter
    * tightened with the POSITIONAL filter. Exact — the result set is
    * identical to [[join]] — but strictly fewer pairs reach the
    * verification join, which at corpus scale is the expensive stage
    * (it rejoins the full token arrays).
    *
    * The positional filter: Jaccard ≥ t ⇔ overlap ≥ α where
    * α = ⌈t·(|x|+|y|)/(1+t)⌉ (in exact integers:
    * ⌈tNum·(nx+ny)/(tNum+tDen)⌉). For a candidate pair, let (i, j) be
    * the 1-indexed positions of their FIRST common token in the shared
    * rare-first global order. No common token precedes it on either
    * side, so overlap ≤ 1 + min(nx − i, ny − j); prune when that upper
    * bound < α. The first common token is always the minimal SHARED
    * PREFIX token: were any common token earlier in the order, its
    * position would be smaller than a known in-prefix position, hence
    * itself inside both prefixes — contradiction with minimality. And
    * positions are order-consistent across docs, so per pair
    * (min posA, min posB) over shared prefix tokens are exactly that
    * token's (i, j) — one groupBy replaces [[join]]'s distinct, same
    * shuffle count.
    */
  def ppjoin(docs: DataFrame, tNum: Int, tDen: Int): DataFrame =
    ppjoinStages(rareFirst(docs), tNum, tDen)._3

  /** 1-row candidate funnel: distinct pairs surviving prefix + length
    * filters, survivors of the positional filter, final verified pairs
    * — the measured evidence that the positional filter pays for itself
    * before the verification join. Lazy (no actions). */
  def ppjoinStats(docs: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    val (pre, pos, fin) = ppjoinStages(rareFirst(docs), tNum, tDen)
    funnelStats(pre, pos, fin)
  }

  /** The funnel row over the three stage frames — ONE definition shared
    * by [[ppjoinStats]] and callers that cache [[ppjoinStages]]. */
  def funnelStats(pre: DataFrame, pos: DataFrame, fin: DataFrame): DataFrame =
    pre.agg(count(lit(1)).as("n_prefix_cands"))
      .crossJoin(pos.agg(count(lit(1)).as("n_pos_cands")))
      .crossJoin(fin.agg(count(lit(1)).as("n_pairs")))

  /** PPJoin's three stage frames (prefix+length candidates, positional
    * survivors, verified pairs) over an already [[rareFirst]]-ordered
    * frame — public so a memoizing caller persists each stage once. */
  def ppjoinStages(ordered: DataFrame, tNum: Int, tDen: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    require(tNum > 0 && tNum <= tDen, "threshold must be in (0, 1]")
    val n = size(col("toks"))
    val pfxLen = n - ceilFrac(n, tNum, tDen) + 1
    // 1-indexed position within the FULL rare-first order — the i/j the
    // positional bound needs
    val prefix = ordered
      .select(col("id"), n.as("n"), posexplode(slice(col("toks"), lit(1), pfxLen)))
      .select(col("id"), col("n"), (col("pos") + 1).as("pos"), col("col").as("token"))
    val cands = prefix.groupBy(col("token"))
      .agg(sort_array(collect_set(struct(col("id"), col("n"), col("pos")))).as("ms"))
      .where(size(col("ms")) >= 2)
      .select(explode(CandidateGen.pairwise(col("ms"),
        (x, y) => struct(x("id").as("idA"), y("id").as("idB"),
          x("n").as("nA"), y("n").as("nB"),
          x("pos").as("posA"), y("pos").as("posB")),
        (x, y) => least(x("n"), y("n")) * tDen >= greatest(x("n"), y("n")) * tNum))
        .as("p"))
      .select(col("p.*"))
      // one groupBy where join() has a distinct — same shuffle count;
      // nA/nB are constant per id (max is just a pick)
      .groupBy(col("idA"), col("idB"))
      .agg(max(col("nA")).as("nA"), max(col("nB")).as("nB"),
        min(col("posA")).as("posA"), min(col("posB")).as("posB"))
    val alpha = floor(((col("nA") + col("nB")) * tNum + lit(tNum + tDen - 1))
      / (tNum + tDen)).cast("int")
    val ubound = lit(1) + least(col("nA") - col("posA"), col("nB") - col("posB"))
    val posPass = cands.where(ubound >= alpha).select(col("idA"), col("idB"))
    val slim = ordered.select(col("id"), col("toks"))
    val fin = posPass
      .join(slim.withColumnRenamed("id", "idA").withColumnRenamed("toks", "tA"), "idA")
      .join(slim.withColumnRenamed("id", "idB").withColumnRenamed("toks", "tB"), "idB")
      .select(col("idA"), col("idB"),
        size(array_intersect(col("tA"), col("tB"))).as("isect"),
        size(array_union(col("tA"), col("tB"))).as("union_n"))
      .where(col("isect") * tDen >= col("union_n") * tNum)
      .select(col("idA"), col("idB"), col("isect"), col("union_n"),
        round(col("isect").cast("double") / col("union_n"), 6).as("jaccard"))
    (cands.select(col("idA"), col("idB")), posPass, fin)
  }

  /** EXACT cosine set-similarity self-join over binary token sets
    * (All-Pairs, Bayardo et al. WWW'07 §3 cosine case):
    * cos(x, y) = |x∩y| / √(|x|·|y|) ≥ tNum/tDen, no false negatives.
    *
    * Completeness of the symmetric prefix: a qualifying pair has
    * overlap ≥ t·√(|x||y|) ≥ t²·|x| on each side (length filter:
    * min ≥ t²·max, same derivation), so with αx = ⌈|x|·tNum²/tDen²⌉
    * the SMALLEST shared token in the global rare-first order must sit
    * inside BOTH prefixes of length |·| − α + 1 — were it in x's
    * suffix (the α−1 largest tokens of x), the ≥ α−1 other shared
    * tokens, all larger, could not fit behind it. Verification is
    * integer-exact: isect²·tDen² ≥ |x|·|y|·tNum² (both sides long —
    * no float boundary between engines); the reported `cos2` is the
    * squared cosine as a 6-dp rational, sqrt never computed.
    * Same two-shuffle scale shape as [[join]].
    */
  def cosineJoin(docs: DataFrame, tNum: Int, tDen: Int): DataFrame =
    cosineJoinOrdered(rareFirst(docs), tNum, tDen)

  /** [[cosineJoin]] over an already [[rareFirst]]-ordered frame. */
  def cosineJoinOrdered(ordered: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen, "threshold must be in (0, 1]")
    val (t2Num, t2Den) = (tNum.toLong * tNum, tDen.toLong * tDen)
    val n = size(col("toks"))
    // αx = ⌈n·t²⌉ in exact integer arithmetic
    val alpha = floor((n * t2Num + lit(t2Den - 1)) / t2Den).cast("int")
    val prefix = ordered.select(col("id"), n.as("n"),
      explode(slice(col("toks"), lit(1), n - alpha + 1)).as("token"))
    val cands = prefix.groupBy(col("token"))
      .agg(sort_array(collect_set(struct(col("id"), col("n")))).as("ms"))
      .where(size(col("ms")) >= 2)
      // length filter: cos ≥ t ⇒ min(|x|,|y|)·tDen² ≥ max·tNum²
      .select(explode(CandidateGen.pairwise(col("ms"),
        (x, y) => struct(x("id").as("idA"), y("id").as("idB")),
        (x, y) => least(x("n"), y("n")).cast("long") * t2Den >=
          greatest(x("n"), y("n")).cast("long") * t2Num))
        .as("p"))
      .select(col("p.idA"), col("p.idB"))
      .distinct()
    val slim = ordered.select(col("id"), col("toks"))
    cands
      .join(slim.withColumnRenamed("id", "idA").withColumnRenamed("toks", "tA"), "idA")
      .join(slim.withColumnRenamed("id", "idB").withColumnRenamed("toks", "tB"), "idB")
      .select(col("idA"), col("idB"),
        size(array_intersect(col("tA"), col("tB"))).cast("long").as("isect"),
        size(col("tA")).cast("long").as("nA"), size(col("tB")).cast("long").as("nB"))
      .where(col("isect") * col("isect") * t2Den >= col("nA") * col("nB") * t2Num)
      .select(col("idA"), col("idB"), col("isect"), col("nA"), col("nB"),
        round((col("isect") * col("isect")).cast("double") / (col("nA") * col("nB")), 6)
          .as("cos2"))
  }
}

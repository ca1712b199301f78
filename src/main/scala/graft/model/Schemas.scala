package graft.model

/** Typed row schemas for every pipeline stage (FIXTURES.md §3). All are
  * case classes so `Dataset[T]` Encoders are derived by Catalyst —
  * per the input_hint: typed Dataset/DataFrame throughout, no RDDs.
  */

/** Input table shape mandated by BASELINE.json input_hint:
  * (repo, path, commit, lang, content) — all strings. `groupId` is the
  * synthetic ground-truth duplicate group (−1 when unknown/real data);
  * it rides along for F1 evaluation and is dropped from blocking/scoring
  * inputs so it can never leak into the pipeline's decisions.
  */
final case class FileRow(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String,
    groupId: Long)

/** Parse-stage output: the shuffle-safe flattened tree (SURVEY.md §2.3)
  * plus identity, the sha256 per-row invariant, and size metadata used
  * for blocking. */
final case class TreeRow(
    id: String,
    repo: String,
    path: String,
    commit: String,
    lang: String,
    sha256: String,
    labels: Array[String],
    labelsH: Array[Long],
    lmds: Array[Int],
    keyroots: Array[Int],
    n: Int,
    nTokens: Int,
    truncated: Boolean,
    minhash: Array[Long],
    groupId: Long)

/** Candidate pair, canonical order idA < idB. */
final case class PairRow(idA: String, idB: String, lang: String, sizeBucket: Int)

/** Scored pair. normDist = dist / (nA + nB) ∈ [0, 1] under unit costs
  * (the unit-cost bound d ≤ |A|+|B| makes this a proper normalization).
  * `dist` is exact when the pair matches (d ≤ τ·(nA+nB)); for
  * non-matches the banded kernel reports the deterministic cap
  * ⌊τ·(nA+nB)⌋+1 — a lower bound sufficient for the match decision. */
final case class ScoreRow(
    idA: String,
    idB: String,
    dist: Int,
    nA: Int,
    nB: Int,
    normDist: Double,
    isMatch: Boolean)

/** Node → cluster representative (min member id). */
final case class ClusterRow(id: String, clusterId: String)

/** Per-partition lineage/metrics row emitted by the scoring stage. */
final case class PartMetrics(
    stage: String,
    partitionId: Int,
    rowsIn: Long,
    rowsOut: Long,
    pairsScored: Long,
    dpCells: Long,
    wallNs: Long)

package graft.operators

import graft.model.TreeRow
import graft.util.Hashing
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Stage 2: blocking — candidate pair generation without the O(N²)
  * cartesian product.
  *
  * Block key = (lang, sizeBucket, band, bandHash) per the north_star.
  * The reference has no blocking at all (its API scores one given pair);
  * this stage is what makes ZSS affordable at corpus scale: only pairs
  * that share a key are ever scored.
  *
  * Scale design (10^12-file rationale):
  *  - Pair generation is ONE shuffle: explode each row into its block
  *    keys, `groupBy(key)` + `collect_list`, emit intra-block pairs.
  *    No self-join — the classic equi-self-join formulation shuffles the
  *    full table twice and its hot keys explode quadratically inside a
  *    single join task; the grouped form lets us cap each block
  *    deterministically BEFORE pairs exist.
  *  - Hot-key skew: blocks are capped at `maxBlockSize` members (kept =
  *    lowest ids, deterministic). An uncapped hot block of 10^6 members
  *    would emit 5·10^11 pairs — caps + the banded MinHash key keep block
  *    cardinality near-uniform; AQE skew-join split stays enabled for the
  *    residual skew in the downstream tree-fetch joins (Pipeline).
  *  - Size-bucket boundary safety: each row emits buckets for n and n−4,
  *    so two rows within 4 tokens of each other always share ≥1 bucket
  *    (bucket width 64 > 4 ⇒ the two emitted buckets bracket every
  *    neighbor's). Near-duplicates under the mutation model differ by ≤3
  *    tokens.
  */
object Blocking {

  final case class BlockingConfig(
      bucketWidth: Int = 64,
      sizeSlack: Int = 4,
      maxBlockSize: Int = 64,
      mh: ParseStage.MinHashConfig = ParseStage.MinHashConfig())

  def sizeBucket(nTokens: Int, width: Int): Int = nTokens / width

  /** All block keys for one row: for each (sizeBucket variant × band),
    * key = hash(lang, bucket, band, the band's minhash rows). */
  def keysFor(lang: String, nTokens: Int, minhash: Array[Long], cfg: BlockingConfig): Array[Long] = {
    val b0 = sizeBucket(math.max(0, nTokens - cfg.sizeSlack), cfg.bucketWidth)
    val b1 = sizeBucket(nTokens, cfg.bucketWidth)
    val buckets = if (b0 == b1) Array(b1) else Array(b0, b1)
    val rows = cfg.mh.rows
    val langH = Hashing.hashString(lang)
    val out = new Array[Long](buckets.length * cfg.mh.bands)
    var o = 0
    var bi = 0
    while (bi < buckets.length) {
      var band = 0
      while (band < cfg.mh.bands) {
        val init = Hashing.mix64(langH ^ Hashing.hashLong(buckets(bi).toLong, 17L) ^ Hashing.hashLong(band.toLong, 23L))
        out(o) = Hashing.foldBand(init, minhash, band, rows)
        o += 1
        band += 1
      }
      bi += 1
    }
    out
  }

  /** Candidate pairs `(idA, idB)` with idA < idB, deduplicated across
    * keys. Exact content duplicates (same sha256) are paired by a cheap
    * dedicated key as well, so identical files never rely on MinHash.
    */
  def candidatePairs(trees: Dataset[TreeRow], cfg: BlockingConfig = BlockingConfig()): DataFrame =
    CandidateGen.pairsFromKeys(keyedIds(trees, cfg), cfg.maxBlockSize)

  /** `(key, id)` block-index rows for every tree: the MinHash-band keys
    * plus a dedicated sha256 key (identical files never rely on MinHash).
    * THE single definition of key derivation — the batch pair generator
    * and the streaming block index both call it, so any change to keying
    * reaches both paths (the stream==batch oracle depends on that). */
  def keyedIds(trees: Dataset[TreeRow], cfg: BlockingConfig): DataFrame = {
    import trees.sparkSession.implicits._
    trees.flatMap { t =>
      val ks = keysFor(t.lang, t.nTokens, t.minhash, cfg)
      val shaKey = Hashing.hashString(t.sha256, 0xabcdefL)
      (ks :+ shaKey).map(k => (k, t.id))
    }.toDF("key", "id")
  }

  /** Diagnostics: block-size histogram (oracle-checkable on the simple
    * lang+bucket blocking — MinHash keys are engine-internal). */
  def blockHistogram(trees: Dataset[TreeRow], bucketWidth: Int): DataFrame = {
    import trees.sparkSession.implicits._
    trees.toDF()
      .select($"lang", (floor($"nTokens" / bucketWidth)).cast("int").as("size_bucket"))
      .groupBy($"lang", $"size_bucket")
      .agg(count(lit(1)).as("n_files"))
  }
}

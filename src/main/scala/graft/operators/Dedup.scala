package graft.operators

import graft.util.Hashing
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Deduplication family for large-scale training-data pipelines:
  * exact (hash groupBy), MinHash+LSH, SimHash, and n-gram Jaccard
  * verification. All candidate generation funnels through
  * [[CandidateGen.pairsFromKeys]] (capped, skew-safe); signatures are
  * computed in one narrow map per document.
  */
object Dedup {

  /** Exact duplicate groups by content hash. One shuffle; map-side
    * partial aggregation applies since count/min are algebraic. */
  def exactDupGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(md5(col(textCol)).as("content_hash"), col(idCol).cast("long").as("id"))
      .groupBy(col("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("id")).as("keep_id"))
      .where(col("n_copies") > 1)

  /** Drop exact duplicates, keeping the smallest id per content hash —
    * the canonical "exact dedup" pass before any near-dup work. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    WindowOps.keepTopRow(docs, Seq(md5(col(textCol))), Seq(col(idCol)))

  // --- MinHash near-dup ---------------------------------------------------

  /** Single definition of the per-block member cap shared by every
    * dedup candidate generator AND the DuckDB oracle SQL
    * (TextQueries.pairsFromKeysSql interpolates it) — changing it here
    * changes both sides together, so query and oracle cannot desync. */
  val DefaultBlockCap: Int = 64

  final case class MinHashParams(numHashes: Int = 12, bands: Int = 6, shingleWords: Int = 3, cap: Int = DefaultBlockCap) {
    require(numHashes % bands == 0)
    def rows: Int = numHashes / bands
  }

  /** Word-shingle MinHash signature (reuses the seeded-minimum scheme of
    * [[ParseStage.minHash]], over whitespace words instead of code
    * tokens). */
  def wordMinHash(text: String, p: MinHashParams): Array[Long] = {
    val words = text.toLowerCase.split("\\W+").filter(_.nonEmpty)
    ParseStage.minHash(words, ParseStage.MinHashConfig(p.numHashes, p.bands, p.shingleWords))
  }

  /** `(key, id)` banded-MinHash block index — the stage table the
    * candidate join runs on. Public so Verify can dump it for the DuckDB
    * oracle, which redoes the cap + pair algebra independently. */
  def minHashKeyed(docs: DataFrame, idCol: String, textCol: String,
                   p: MinHashParams = MinHashParams()): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .flatMap { case (id, text) =>
        val sig = wordMinHash(text, p)
        val rows = p.rows
        (0 until p.bands).iterator.map { band =>
          var h = Hashing.hashLong(band.toLong, 77L)
          var r = 0
          while (r < rows) { h = Hashing.mix64(h ^ sig(band * rows + r)); r += 1 }
          (h, id)
        }
      }.toDF("key", "id")
  }

  /** Near-duplicate candidate pairs on a text column via banded MinHash. */
  def minHashPairs(docs: DataFrame, idCol: String, textCol: String,
                   p: MinHashParams = MinHashParams()): DataFrame =
    CandidateGen.pairsFromKeys(minHashKeyed(docs, idCol, textCol, p), p.cap)

  /** Incremental (streaming-shaped) MinHash near-dup: fold document
    * batches through the SAME capped-member block index the streaming
    * ER path uses ([[CandidateGen.mergeCappedMembers]] — per batch, one
    * delta-sized exchange; [[CandidateGen.pairsWithNewMember]] — pair
    * emission with no join, membership colocated in the row). Returns
    * the cumulative near-dup candidate pair set: every pair emitted the
    * batch its later member arrived. When no block overflows the cap
    * this equals the batch [[minHashPairs]] exactly (subset
    * monotonicity); under eviction it is the standard streaming
    * superset — a pair, once found, is never un-found. This is the
    * incremental corpus-dedup shape a 100 TB ingest pipeline runs:
    * state lives as a key-bucketed capped table and each batch
    * shuffles only its delta. */
  def minHashPairsIncremental(batches: Seq[DataFrame], idCol: String, textCol: String,
                              p: MinHashParams = MinHashParams()): DataFrame = {
    require(batches.nonEmpty, "need at least one batch")
    var idx: Option[DataFrame] = None
    var pairs: Option[DataFrame] = None
    // keep the EXACT persisted handles: unpersisting a derived plan (a
    // select over the persisted one) is a cache-manager no-op, which
    // would leak every batch's block index for the application lifetime
    var cached = List.empty[DataFrame]
    for (b <- batches) {
      val merged = CandidateGen
        .mergeCappedMembers(idx, minHashKeyed(b, idCol, textCol, p), p.cap)
        .persist()
      merged.count() // materialize before the previous state goes cold
      cached ::= merged
      val newPairs = CandidateGen.pairsWithNewMember(merged)
      pairs = Some(pairs.map(_.unionByName(newPairs)).getOrElse(newPairs))
      idx = Some(merged.select(col("key"), col("members")))
    }
    // eager localCheckpoint decouples the result from the per-batch
    // caches (their blocks are freed NOW, not when the caller happens to
    // drop the last reference), then release every intermediate
    val out = pairs.get.distinct().localCheckpoint(true)
    cached.foreach(_.unpersist())
    out
  }

  /** Near-dup DEDUP (not just candidate pairs): connected components
    * over the near-dup pair graph — the transitive closure a production
    * dedup applies, because near-dup is not transitive (A≈B, B≈C does
    * not imply A≈C, but keeping both A and C while dropping B is how
    * dedup pipelines leak near-copies) — keeping the smallest id per
    * component. Returns the surviving ids. Reuses the large-star/
    * small-star CC operator, whose clusterId is the component's minimum
    * id, so the keeper set is exactly the distinct clusterIds. */
  def nearDupKeepers(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val ids = docs.select(col(idCol).cast("long").as("id"))
    Clustering.connectedComponents(pairs.select(col("idA"), col("idB")), ids)
      .select(col("clusterId").as(idCol))
      .distinct()
  }

  // --- SimHash near-dup ---------------------------------------------------

  /** Charikar SimHash (64-bit) over word hashes: bit b of the signature
    * is the sign of the sum over words of ±1 at bit b. Near-dups have
    * small Hamming distance. */
  def simHash64(text: String): Long = {
    val words = text.toLowerCase.split("\\W+").filter(_.nonEmpty)
    val counts = new Array[Int](64)
    var i = 0
    while (i < words.length) {
      val h = Hashing.hashString(words(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** `(id, simhash)` signature table. Public for oracle dumps: DuckDB
    * redoes the hamming verification with its own bit_count(xor). */
  def simHashSigs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, text) => (id, simHash64(text)) }
      .toDF("id", "simhash")
  }

  /** `(key, id)` pigeonhole chunk index over the signatures. */
  def simHashKeyed(sigs: DataFrame, maxHamming: Int): DataFrame = {
    val spark = sigs.sparkSession
    import spark.implicits._
    val nChunks = maxHamming + 1
    val chunkBits = 64 / nChunks
    sigs.select(col("id"), col("simhash")).as[(Long, Long)]
      .flatMap { case (id, sig) =>
        (0 until nChunks).iterator.map { c =>
          val chunk = (sig >>> (c * chunkBits)) & ((1L << chunkBits) - 1)
          (Hashing.mix64(Hashing.hashLong(c.toLong, 55L) ^ chunk), id)
        }
      }.toDF("key", "id")
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming.
    * Candidate generation by the pigeonhole principle: the 64-bit
    * signature splits into `maxHamming + 1` chunks, and any pair within
    * the Hamming budget must agree on at least one whole chunk — block
    * on (chunkIdx, chunkValue), then verify with bit_count(xor).
    * The signature map is recomputed per read (3×: keys + two verify
    * joins) instead of persisted — a long-lived session calling this per
    * corpus would otherwise leak cache entries, and the map is a narrow
    * codegen'd stage that costs far less than the shuffle it feeds. */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, cap: Int = DefaultBlockCap): DataFrame = {
    val sigs = simHashSigs(docs, idCol, textCol)
    val cand = CandidateGen.pairsFromKeys(simHashKeyed(sigs, maxHamming), cap)
    cand
      .join(sigs.withColumnRenamed("id", "idA").withColumnRenamed("simhash", "shA"), "idA")
      .join(sigs.withColumnRenamed("id", "idB").withColumnRenamed("simhash", "shB"), "idB")
      .withColumn("hamming", bit_count(col("shA").bitwiseXOR(col("shB"))))
      .where(col("hamming") <= maxHamming)
      .select(col("idA"), col("idB"), col("hamming"))
  }

  // --- n-gram Jaccard verification ---------------------------------------

  /** Exact token n-gram Jaccard for candidate pairs — the verify step
    * after LSH recall stages. Shingle sets are built once per doc in a
    * narrow map; the set algebra runs on codegen'd array functions. */
  /** `(id, shingles)` distinct hashed word-n-gram sets, one narrow map
    * per doc. Public for oracle dumps: DuckDB redoes the Jaccard set
    * algebra over the dumped arrays. */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, text) =>
        val words = text.toLowerCase.split("\\W+").filter(_.nonEmpty)
        val sh = (0 until math.max(1, words.length - n + 1)).map { i =>
          var h = 0L
          var j = 0
          while (j < n && i + j < words.length) { h = Hashing.mix64(h ^ Hashing.hashString(words(i + j))); j += 1 }
          h
        }.distinct.toArray
        (id, sh)
      }
      .toDF("id", "shingles")
  }

  def ngramJaccard(candidates: DataFrame, docs: DataFrame, idCol: String,
                   textCol: String, n: Int = 3): DataFrame = {
    val shingled = shingleSets(docs, idCol, textCol, n)
    candidates
      .join(shingled.withColumnRenamed("id", "idA").withColumnRenamed("shingles", "shA"), "idA")
      .join(shingled.withColumnRenamed("id", "idB").withColumnRenamed("shingles", "shB"), "idB")
      .withColumn("inter", size(array_intersect(col("shA"), col("shB"))))
      .withColumn("union", size(array_union(col("shA"), col("shB"))))
      .withColumn("jaccard", col("inter").cast("double") / greatest(col("union"), lit(1)).cast("double"))
      .select(col("idA"), col("idB"), col("jaccard"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-preserving record linkage (PPRL) field encoding: the classic
  * Bloom-filter / cryptographic-long-term-key scheme (Schnell, Bachteler
  * & Reiher, BMC Med Inf 2009): pad the lowercased field with boundary
  * markers, take its q-grams, map each gram through k seeded hash
  * functions into an m-bit Bloom filter, and compare records by the
  * DICE coefficient of their bitsets — similarity survives encoding
  * while the raw field never leaves the encoding boundary.
  *
  * Everything is public Spark builtins inside whole-stage codegen:
  * q-grams via sequence/substr, the k hash family via xxhash64 with the
  * function index as a hashed column, variable-distance shifts via
  * call_function("shiftleft", …), packing via aggregate/filter over the
  * word index. The bitset is a dense Array[Long] (m/64 words — 4 longs
  * at m=256), so a 10^12-row encoded table is ~32 B/row + id, and the
  * pairwise comparator is a pure per-row scalar: zip_with + bit_count
  * over 4 words, no explode, no shuffle beyond the pair join itself.
  *
  * The match DECISION is integer-exact (2·inter·den ≥ num·(|A|+|B|)
  * cross-multiplied), so no float boundary exists between engines; the
  * reported dice value is rounded to 6 dp for the oracle compare.
  */
object Pprl {

  final case class ClkConfig(
      bits: Int = 256,   // m: filter width (must be a multiple of 64)
      k: Int = 4,        // hash functions per gram
      q: Int = 2,        // gram width
      pad: String = "#") // boundary marker

  /** q-grams of `#field#` (lowercased): positions 1..len-q+1. */
  def grams(field: Column, cfg: ClkConfig = ClkConfig()): Column = {
    val padded = concat(lit(cfg.pad), lower(field), lit(cfg.pad))
    transform(
      sequence(lit(1), greatest(length(padded) - (cfg.q - 1), lit(1))),
      i => padded.substr(i, lit(cfg.q)))
  }

  /** All k·|grams| bit positions (distinct): pos = xxhash64(j, gram) mod m. */
  def bitPositions(field: Column, cfg: ClkConfig = ClkConfig()): Column =
    array_distinct(flatten(transform(grams(field, cfg), g =>
      transform(sequence(lit(0), lit(cfg.k - 1)), j =>
        pmod(xxhash64(j, g), lit(cfg.bits)).cast("int")))))

  /** Pack an array<int> of bit positions into Array[Long] words. */
  def packBits(pos: Column, bits: Int): Column = {
    require(bits % 64 == 0, "bits must be a multiple of 64")
    transform(sequence(lit(0), lit(bits / 64 - 1)), w =>
      aggregate(
        filter(pos, p => shiftright(p, 6) === w),
        lit(0L),
        (acc, p) => acc.bitwiseOR(
          call_function("shiftleft", lit(1L), pmod(p, lit(64))))))
  }

  /** Packed m-bit Bloom filter as Array[Long] (little-endian words). */
  def clk(field: Column, cfg: ClkConfig = ClkConfig()): Column =
    packBits(bitPositions(field, cfg), cfg.bits)

  /** docs: (id, field). Returns (id, bf, nbits). */
  def encode(docs: DataFrame, cfg: ClkConfig = ClkConfig()): DataFrame =
    docs.select(col("id"), clk(col("field"), cfg).as("bf"))
      .withColumn("nbits", popcount(col("bf")))

  /** COMPOSITE CLK — the actual cryptographic-long-term-key design of
    * Schnell et al. 2009 §Methods: ALL of a record's quasi-identifying
    * fields hash into ONE long filter. Each element array hashes
    * through a FIELD-TAGGED family (xxhash64(fieldIdx, j, element)),
    * so "src" as a path gram and "src" as a content token set
    * different bits. More fields = more entropy: the single-field path
    * CLK of this corpus carries ~40 mostly-template bits and its LSH
    * recall is seed-fragile (measured 0.74–1.00 across seeds), while
    * the 1024-bit composite over path grams + lang + content tokens
    * separates dup hamming (tens) from non-dup (hundreds) so blocking
    * is stable (measured recall 1.0 at every probed seed). */
  def clkComposite(elemCols: Seq[Column], cfg: ClkConfig): Column = {
    val pos = array_distinct(
      elemCols.zipWithIndex.map { case (elems, f) =>
        flatten(transform(elems, e =>
          transform(sequence(lit(0), lit(cfg.k - 1)), j =>
            pmod(xxhash64(lit(f), j, e), lit(cfg.bits)).cast("int"))))
      }.reduce(concat(_, _)))
    packBits(pos, cfg.bits)
  }

  /** docs: (id, <element array columns>). Returns (id, bf, nbits). */
  def encodeComposite(docs: DataFrame, elemCols: Seq[String],
                      cfg: ClkConfig): DataFrame =
    docs.select(col("id"),
        clkComposite(elemCols.map(col), cfg).as("bf"))
      .withColumn("nbits", popcount(col("bf")))

  /** Σ bit_count over an Array[Long] bitset column. */
  def popcount(bf: Column): Column =
    aggregate(transform(bf, w => bit_count(w).cast("int")), lit(0),
      (acc, v) => acc + v)

  /** |A ∩ B| for two packed bitsets. */
  def intersectBits(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => bit_count(x.bitwiseAND(y)).cast("int")),
      lit(0), (acc, v) => acc + v)

  /** The composite-CLK width used for BLOCKING: wide enough that the
    * multi-field bit mass separates (1024 bits ≈ 0.18 density over
    * ~55 elements·k=4). The narrow 256-bit [[ClkConfig]] stays the
    * per-field comparator encoding (er_pprl). */
  val CompositeClk: ClkConfig = ClkConfig(bits = 1024)

  /** Hamming-LSH blocking over the ENCODED filters (Durham 2012's
    * private blocking shape): band t samples `rho` fixed bit positions
    * of the CLK (drawn without replacement from a seeded shuffle — the
    * ONE definition [[bandPositions]], which the DuckDB oracle
    * interpolates as literals), and two records are candidates iff all
    * rho sampled bits agree in some band. Candidate generation thus
    * never touches the raw field: encode → band → purged bucket join
    * runs entirely in encoded space, which is the point of PPRL.
    *
    * Parameters are tuned on the measured geometry of the COMPOSITE
    * 1024-bit CLK (path grams + lang + content tokens): dup hamming
    * 10–35, non-dup 132–242 — a wide gap, so (rho=48, bands=16,
    * purge=64) measures recall 1.0 at ~0.7 % candidate volume over
    * 500 docs, stable across probed seeds (≥ 0.994). A SINGLE-field
    * path CLK is not blockable here: its ~40 mostly-template bits
    * give seed-fragile recall (0.74–1.00) at 13–30 % volume, which is
    * exactly why the composite multi-field key is the published CLK
    * design. Low-entropy bands still produce oversized buckets; those
    * are PURGED, not truncated — a cap keeps C(cap,2) junk pairs and
    * drops true ones arbitrarily, while a purged block loses nothing
    * because true pairs also collide in the selective bands. */
  final case class HlshConfig(bands: Int = 16, rho: Int = 48,
                              purge: Int = 64, seed: Long = 77L)

  /** Per-band sampled bit positions — deterministic, no replacement. */
  def bandPositions(cfg: HlshConfig = HlshConfig(),
                    bits: Int = ClkConfig().bits): IndexedSeq[IndexedSeq[Int]] =
    (0 until cfg.bands).map { t =>
      val rng = new scala.util.Random(cfg.seed * 1000003L + t)
      rng.shuffle((0 until bits).toVector).take(cfg.rho)
    }

  /** Band keys over the packed filter: (id, key) with key =
    * "t:" + Σ_s bit(pos(t)(s)) << s — all long arithmetic on the packed
    * words, codegen'd, one row per (id, band). */
  def hlshKeys(encoded: DataFrame, cfg: HlshConfig = HlshConfig(),
               clk: ClkConfig = ClkConfig()): DataFrame = {
    // a clk narrower than the actual filter would silently sample only
    // its first words (e.g. 4 of the composite's 16) and degrade
    // blocking to the seed-fragile low-entropy regime — fail loudly
    // instead (assert_true is codegen'd, one comparison per row)
    val widthChecked = encoded.withColumn("__w",
      assert_true(size(col("bf")) === lit(clk.bits / 64),
        lit(s"CLK width mismatch: filter is not ${clk.bits} bits — " +
          "pass the clk the table was encoded with")))
    val keyCols = bandPositions(cfg, clk.bits).zipWithIndex.map { case (ps, t) =>
      val k = ps.zipWithIndex.map { case (p, s) =>
        shiftleft(
          shiftright(element_at(col("bf"), p / 64 + 1), p % 64)
            .bitwiseAND(lit(1L)), s)
      }.reduce(_ bitwiseOR _)
      concat(lit(s"$t:"), k.cast("string"))
    }
    widthChecked.select(col("id"), col("__w"),
        explode(array(keyCols: _*)).as("key"))
      .drop("__w")
  }

  /** Candidate pairs from the band keys with oversized-block PURGING:
    * a block whose DISTINCT membership exceeds `purge` is dropped
    * whole, and survivors pair a<b through the sorted-set explode.
    * Set semantics throughout (countDistinct, collect_set) so a
    * duplicate (key, id) row can never change the purge decision —
    * which also keeps this definition in lockstep with the streaming
    * twin's array_union state ([[graft.streaming.StreamingPprl]]).
    * The count runs as its own small aggregate joined back (rather
    * than a window) so no task ever buffers a mega-block's full
    * membership just to discover it must be dropped; the surviving
    * collect_set is bounded by purge, and the explode fan-out by
    * C(purge, 2). */
  def purgedPairs(keyed: DataFrame, purge: Int): DataFrame = {
    val keep = keyed.groupBy(col("key"))
      .agg(countDistinct(col("id")).as("__n"))
      .where(col("__n") <= purge)
      .select(col("key"))
    keyed
      .join(keep, Seq("key"), "left_semi")
      .groupBy(col("key"))
      .agg(sort_array(collect_set(col("id"))).as("ids"))
      .where(size(col("ids")) >= 2)
      .select(explode(CandidateGen.pairwise(col("ids"),
        (x, y) => struct(x.as("idA"), y.as("idB")))).as("p"))
      .select(col("p.idA"), col("p.idB"))
      .distinct()
  }

  /** The full encoded-space candidate generator: encode → band →
    * purge → pair, never touching the raw field. */
  def encodedPairs(encoded: DataFrame, cfg: HlshConfig = HlshConfig(),
                   clk: ClkConfig = ClkConfig()): DataFrame =
    purgedPairs(hlshKeys(encoded, cfg, clk), cfg.purge)

  /** Dice comparator over candidate pairs. pairs: (idA, idB);
    * encoded: (id, bf, nbits). Decision dice ≥ num/den is evaluated
    * integer-exactly. Returns (idA, idB, inter, na, nb, dice, is_match). */
  def dice(pairs: DataFrame, encoded: DataFrame,
           num: Int = 7, den: Int = 10): DataFrame =
    pairs
      .join(encoded.select(col("id").as("idA"),
        col("bf").as("bfA"), col("nbits").as("na")), Seq("idA"))
      .join(encoded.select(col("id").as("idB"),
        col("bf").as("bfB"), col("nbits").as("nb")), Seq("idB"))
      .select(col("idA"), col("idB"),
        intersectBits(col("bfA"), col("bfB")).as("inter"),
        col("na"), col("nb"))
      .select(col("idA"), col("idB"), col("inter"), col("na"), col("nb"),
        round(lit(2.0) * col("inter") / (col("na") + col("nb")), 6).as("dice"),
        (lit(2 * den) * col("inter") >= lit(num) * (col("na") + col("nb")))
          .cast("int").as("is_match"))
}

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

  /** Packed m-bit Bloom filter as Array[Long] (little-endian words). */
  def clk(field: Column, cfg: ClkConfig = ClkConfig()): Column = {
    require(cfg.bits % 64 == 0, "bits must be a multiple of 64")
    val pos = bitPositions(field, cfg)
    transform(sequence(lit(0), lit(cfg.bits / 64 - 1)), w =>
      aggregate(
        filter(pos, p => shiftright(p, 6) === w),
        lit(0L),
        (acc, p) => acc.bitwiseOR(
          call_function("shiftleft", lit(1L), pmod(p, lit(64))))))
  }

  /** docs: (id, field). Returns (id, bf, nbits). */
  def encode(docs: DataFrame, cfg: ClkConfig = ClkConfig()): DataFrame =
    docs.select(col("id"), clk(col("field"), cfg).as("bf"))
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

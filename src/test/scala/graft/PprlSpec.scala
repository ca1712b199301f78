package graft

import graft.operators.Pprl
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PPRL CLK encoding + Dice: gram goldens, bit placement re-derived
  * from first principles via Spark's own xxhash64 on literal grams
  * (independent of the packing pipeline), popcount/intersection
  * identities, decision exactness, and determinism. */
class PprlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val cfg = Pprl.ClkConfig()

  test("q-grams: padded bigrams, lowercased; degenerate empty field") {
    val s = spark; import s.implicits._
    val got = Seq("Ab", "").toDF("f")
      .select(Pprl.grams(col("f"), cfg).as("g")).as[Seq[String]].collect()
    assert(got(0) == Seq("#a", "ab", "b#"))
    assert(got(1) == Seq("##"))
  }

  test("bit placement matches first-principles xxhash64 positions") {
    val s = spark; import s.implicits._
    val field = "m3.src"
    // independent derivation: grams by hand, positions via raw xxhash64
    val grams = ("#" + field + "#").sliding(2).toSeq
    val expectPos = Seq.tabulate(cfg.k)(j => j).flatMap { j =>
      grams.map { g =>
        val h = Seq((j, g)).toDF("j", "g")
          .select(pmod(xxhash64(col("j"), col("g")), lit(cfg.bits)).cast("int"))
          .collect()(0).getInt(0)
        h
      }
    }.distinct.sorted
    val enc = Pprl.encode(Seq(("x", field)).toDF("id", "field"), cfg).collect()(0)
    val bf = enc.getAs[scala.collection.Seq[Long]]("bf")
    val gotPos = (0 until cfg.bits).filter(p => ((bf(p / 64) >> (p % 64)) & 1L) == 1L)
    assert(gotPos == expectPos)
    assert(enc.getAs[Int]("nbits") == expectPos.size)
    assert(bf.size == cfg.bits / 64)
  }

  test("dice: identity=1, symmetry, bounds, integer-exact decision") {
    val s = spark; import s.implicits._
    val docs = Seq(("a", "m3.src"), ("b", "m30.src"), ("c", "zzz/qqq.xyz"))
      .toDF("id", "field")
    val enc = Pprl.encode(docs, cfg).cache()
    val pairs = Seq(("a", "a"), ("a", "b"), ("b", "a"), ("a", "c"))
      .toDF("idA", "idB")
    val d = Pprl.dice(pairs, enc).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getInt(2), r.getInt(3), r.getInt(4), r.getDouble(5), r.getInt(6))).toMap
    val (iaa, naa, _, daa, maa) = d(("a", "a"))
    assert(daa == 1.0 && maa == 1 && iaa == naa)
    val ab = d(("a", "b")); val ba = d(("b", "a"))
    assert(ab._4 == ba._4, "dice symmetric")
    assert(ab._4 > d(("a", "c"))._4, "similar fields score higher")
    for ((_, (i, na, nb, dice, m)) <- d) {
      assert(dice >= 0.0 && dice <= 1.0 && i <= math.min(na, nb))
      assert((m == 1) == (20 * i >= 7 * (na + nb)), "decision is the integer rule")
    }
  }

  test("determinism: same field -> identical bitset") {
    val s = spark; import s.implicits._
    val enc = Pprl.encode(Seq(("p", "g1/m2.src"), ("q", "g1/m2.src"))
      .toDF("id", "field"), cfg)
      .select(col("id"), col("bf")).as[(String, Seq[Long])].collect().toMap
    assert(enc("p") == enc("q"))
  }
}

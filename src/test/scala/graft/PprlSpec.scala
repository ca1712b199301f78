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

  test("hlsh: band keys match first-principles bit sampling of the packed words") {
    val s = spark; import s.implicits._
    val enc = Pprl.encode(Seq(("x", "g1/m2.src")).toDF("id", "field"), cfg)
    val bf = enc.select(col("bf")).as[Seq[Long]].collect()(0)
    val got = Pprl.hlshKeys(enc).orderBy("key")
      .select(col("key")).as[String].collect().toSeq
    val expect = Pprl.bandPositions().zipWithIndex.map { case (ps, t) =>
      val k = ps.zipWithIndex.map { case (p, sh) =>
        ((bf(p / 64) >> (p % 64)) & 1L) << sh
      }.reduce(_ | _)
      s"$t:$k"
    }.sorted
    assert(got == expect)
    assert(got.size == Pprl.HlshConfig().bands)
  }

  test("composite clk: field-tagged bit placement from first principles") {
    val s = spark; import s.implicits._
    val comp = Pprl.CompositeClk
    val docs = Seq(("x", Seq("#a", "ab"), Seq("js"), Seq("def", "fn1")))
      .toDF("id", "f0", "f1", "f2")
    val enc = Pprl.encodeComposite(docs, Seq("f0", "f1", "f2"), comp).collect()(0)
    val bf = enc.getAs[scala.collection.Seq[Long]]("bf")
    assert(bf.size == comp.bits / 64)
    // independent: raw xxhash64(fieldIdx, j, elem) mod bits
    val elems = Seq(0 -> Seq("#a", "ab"), 1 -> Seq("js"), 2 -> Seq("def", "fn1"))
    val expect = (for {
      (f, es) <- elems; e <- es; j <- 0 until comp.k
    } yield Seq((f, j, e)).toDF("f", "j", "e")
      .select(pmod(xxhash64(col("f"), col("j"), col("e")), lit(comp.bits)).cast("int"))
      .collect()(0).getInt(0)).distinct.sorted
    val got = (0 until comp.bits)
      .filter(p => ((bf(p / 64) >> (p % 64)) & 1L) == 1L)
    assert(got == expect)
    assert(enc.getAs[Int]("nbits") == expect.size)
  }

  test("hlsh blocking on the composite clk: planted dups recalled, volume pruned") {
    val s = spark; import s.implicits._
    val comp = Pprl.CompositeClk
    val rng = new scala.util.Random(19)
    def toks(n: Int) = Seq.fill(n)(s"w${rng.nextInt(400)}")
    // 10 groups x 3 members: near-identical content (1 of ~40 tokens
    // perturbed per member -> pairwise <= 2 token diffs), one-digit
    // path diff, same lang — the corpus's dup shape (composite hamming
    // well inside the tuned 10-35 envelope); 60 unrelated singletons
    val groups = (0 until 10).map { g =>
      val stem = s"grp$g/${rng.alphanumeric.take(8).mkString}"
      val content = toks(40)
      (0 until 3).map { m =>
        val mutated = content.updated(rng.nextInt(40), s"m$g$m")
        (s"g${g}_$m", s"${stem}_$m.src", "js", mutated)
      }
    }
    val loners = (0 until 60).map { i =>
      (s"lone_$i", s"q${rng.nextInt(1000)}/x_${rng.alphanumeric.take(6).mkString}.bin",
        "py", toks(40))
    }
    val docs = (groups.flatten ++ loners)
      .toDF("id", "path", "lang", "ctoks")
      .select(col("id"), Pprl.grams(col("path")).as("f0"),
        array(col("lang")).as("f1"), col("ctoks").as("f2"))
    val enc = Pprl.encodeComposite(docs, Seq("f0", "f1", "f2"), comp)
    val pairs = Pprl.encodedPairs(enc, clk = comp)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val truth = groups.flatMap { g =>
      for (i <- g.indices; j <- (i + 1) until g.size)
        yield if (g(i)._1 < g(j)._1) (g(i)._1, g(j)._1) else (g(j)._1, g(i)._1)
    }.toSet
    val recall = truth.count(pairs).toDouble / truth.size
    assert(recall == 1.0, s"recall $recall over ${truth.size} planted pairs")
    // blocking must prune hard: well under a tenth of all C(90,2) pairs
    assert(pairs.size < 90 * 89 / 2 / 10, s"${pairs.size} candidates")
    // identical composite CLKs share every band key -> must collide
    val encIdent = Pprl.encodeComposite(
      Seq(("a", Seq("#s", "sa"), Seq("js"), Seq("t1", "t2")),
        ("b", Seq("#s", "sa"), Seq("js"), Seq("t1", "t2")))
        .toDF("id", "f0", "f1", "f2"),
      Seq("f0", "f1", "f2"), comp)
    assert(Pprl.encodedPairs(encIdent, clk = comp).count() == 1L)
  }

  test("plan lock: purge decides from a map-side-partial distinct count, no cartesian") {
    val s = spark; import s.implicits._
    val keyed = Seq(("k1", "a"), ("k1", "b"), ("k2", "c")).toDF("key", "id")
      .repartition(2)
    val plan = Pprl.purgedPairs(keyed, 4)
      .queryExecution.executedPlan.toString
    // the mega-block guard: the count side must partial-aggregate
    // map-side (one counter per key per partition crosses the wire,
    // never a block's member rows) and prune via a semi-join
    assert(plan.contains("partial_count(distinct"),
      s"purge count must be a map-side partial distinct count\n$plan")
    assert(plan.contains("LeftSemi"),
      s"purge must prune through a semi-join\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"pair generation must never degrade to a cross product\n$plan")
    // collect_set is bounded by the purge filter upstream; its partial
    // runs co-located after the semi-join (no extra exchange for it)
    assert(plan.contains("partial_collect_set"), plan)
  }

  test("determinism: same field -> identical bitset") {
    val s = spark; import s.implicits._
    val enc = Pprl.encode(Seq(("p", "g1/m2.src"), ("q", "g1/m2.src"))
      .toDF("id", "field"), cfg)
      .select(col("id"), col("bf")).as[(String, Seq[Long])].collect().toMap
    assert(enc("p") == enc("q"))
  }
}

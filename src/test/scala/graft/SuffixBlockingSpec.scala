package graft

import graft.operators.SuffixBlocking
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Suffix-array blocking: goldens over a hand-built vocabulary (suffix
  * generation, purge, cross-block pair dedup, Levenshtein verify), a
  * brute-force differential against a test-local sequential replica,
  * and the complementarity property the scheme exists for — prefix
  * variants phonetic blocking misses. */
class SuffixBlockingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def vocabOf(toks: String*) = {
    import spark.implicits._
    toks.toDF("tok")
  }

  /** Sequential reference: suffixes ≥ MinSuffixLen, blocks of 2..max
    * members, all intra-block pairs, dedup. */
  private def bruteForce(toks: Seq[String], maxBlock: Int): Set[(String, String)] = {
    val keyed = for {
      t <- toks.distinct
      if t.length >= SuffixBlocking.MinSuffixLen
      i <- 0 to t.length - SuffixBlocking.MinSuffixLen
    } yield (t.substring(i), t)
    keyed.groupBy(_._1).values
      .map(_.map(_._2).distinct.sorted)
      .filter(ms => ms.length >= 2 && ms.length <= maxBlock)
      .flatMap(ms => for (a <- ms; b <- ms if a < b) yield (a, b))
      .toSet
  }

  test("suffix generation: all suffixes of length >= MinSuffixLen, in order") {
    import spark.implicits._
    val got = vocabOf("blocking").select(SuffixBlocking.suffixes(col("tok")))
      .as[Seq[String]].head()
    assert(got == Seq("blocking", "locking", "ocking", "cking", "king"))
    // short token: empty suffix set
    val short = vocabOf("abc").select(SuffixBlocking.suffixes(col("tok")))
      .as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("golden: shared suffix pairs, purge, cross-block dedup, verify") {
    import spark.implicits._
    // catherine/katherine share 6 suffixes (atherine..erine) — the pair
    // must appear ONCE; "ring"-suffixed fillers make a purgeable block
    val fillers = (0 until 20).map(i => s"w${('a' + i).toChar}ring")
    val vocab = vocabOf(Seq("catherine", "katherine", "smith") ++ fillers: _*)
    val pairs = SuffixBlocking.candidatePairs(vocab, maxBlock = 4)
      .as[(String, String, Int, Boolean)].collect()
    val keys = pairs.map(p => (p._1, p._2))
    assert(keys.distinct.length == keys.length, "pair dedup across blocks")
    assert(keys.contains(("catherine", "katherine")))
    // the 20 fillers share suffix "ring" (block size 20 > 4): purged —
    // no filler pair survives via that block; any surviving filler pair
    // must come from a smaller (≤4) longer-suffix block
    val ringOnly = keys.filter { case (a, b) =>
      a.startsWith("w") && b.startsWith("w") }
    assert(ringOnly.forall { case (a, b) =>
      a.substring(1) == b.substring(1) || {
        // shares a suffix strictly longer than "ring" in a tiny block
        val shared = (SuffixBlocking.MinSuffixLen to math.min(a.length, b.length))
          .exists(l => a.takeRight(l) == b.takeRight(l) && l > 4)
        shared
      }
    })
    val ck = pairs.find(p => p._1 == "catherine" && p._2 == "katherine").get
    assert(ck._3 == 1 && ck._4) // lev 1 → match
  }

  test("differential: DataFrame pairs == sequential brute force (random vocab)") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val alpha = "abcde"
    for (round <- 0 until 5) {
      val toks = (0 until 60).map(_ =>
        (0 to 3 + rng.nextInt(5)).map(_ => alpha(rng.nextInt(alpha.length))).mkString)
        .distinct
      val maxBlock = 3 + round
      val got = SuffixBlocking.candidatePairs(toks.toDF("tok"), maxBlock)
        .select("tokA", "tokB").as[(String, String)].collect().toSet
      assert(got == bruteForce(toks, maxBlock), s"round $round maxBlock $maxBlock")
    }
  }

  test("block histogram: sizes, counts, purge verdicts") {
    import spark.implicits._
    val vocab = vocabOf("catherine", "katherine", "zzzzqqq")
    val hist = SuffixBlocking.blockHistogram(vocab, maxBlock = 16)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    // catherine/katherine share exactly 5 suffix blocks of size 2
    // (atherine, therine, herine, erine, rine)
    assert(hist(2L)._2 == 5L && hist(2L)._3)
    // every other suffix is a singleton block (size 1 — never alive)
    assert(!hist(1L)._3)
  }

  test("complementarity: prefix variants missed by Soundex, caught here") {
    import spark.implicits._
    import org.apache.spark.unsafe.types.UTF8String
    def sx(t: String) = UTF8String.fromString(t.toUpperCase).soundex().toString
    // c/k initial variants get different Soundex codes (the first
    // letter survives verbatim); jonathan/johnathan does NOT (H is
    // transparent) — premise asserted only where it holds
    for ((a, b) <- Seq("catherine" -> "katherine", "christina" -> "kristina"))
      assert(sx(a) != sx(b), s"$a/$b must differ in Soundex (premise)")
    for ((a, b) <- Seq("catherine" -> "katherine",
        "christina" -> "kristina", "jonathan" -> "johnathan")) {
      val got = SuffixBlocking.candidatePairs(vocabOf(a, b))
        .select("tokA", "tokB").as[(String, String)].collect().toSet
      assert(got == Set((Seq(a, b).min, Seq(a, b).max)))
    }
  }
}

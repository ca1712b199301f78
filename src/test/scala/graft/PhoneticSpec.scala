package graft

import graft.operators.Phonetic
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Phonetic blocking: pins Spark's builtin soundex to the classic
  * American-Soundex golden battery (H/W transparent — the exact variant
  * the DuckDB oracle replays in SQL), differentially tests a test-local
  * replica of the oracle's replay algorithm against the builtin over a
  * letter fuzz, and checks the block/verify DataFrame surface. */
class PhoneticSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def sx(tok: String): String =
    UTF8String.fromString(tok.toUpperCase).soundex().toString

  test("builtin soundex: classic golden battery incl. H/W transparency") {
    val golden = Seq(
      "robert" -> "R163", "rupert" -> "R163",
      // H/W transparent: s and c (both code 2) separated by h collapse
      "ashcraft" -> "A261", "ashcroft" -> "A261",
      "tymczak" -> "T522", "pfister" -> "P236", "honeyman" -> "H555",
      // vowel separators re-enable equal codes
      "sasa" -> "S200", "aaron" -> "A650",
      // first letter H/W: its own (transparent) code never absorbs
      "hanna" -> "H500", "who" -> "W000", "white" -> "W300",
      // first-letter group absorbs an equal-coded run
      "czar" -> "C600", "pfpf" -> "P000", "zzyzx" -> "Z200",
      "llama" -> "L500", "jack" -> "J200", "schmidt" -> "S530",
      "knuth" -> "K530", "kant" -> "K530", "queue" -> "Q000")
    for ((tok, want) <- golden)
      assert(sx(tok) == want, s"soundex($tok)=${sx(tok)}, want $want")
  }

  /** Test-local replica of the q_soundex_blocks / q_phonetic_pairs
    * oracle SQL's replay (translate → drop 7s → collapse adjacent →
    * drop first group unless H/W-initial → strip 0s → pad). Kept here,
    * not in main, so the SQL's logic has an executable spec without the
    * engine growing a second soundex. */
  private def replay(tok: String): String = {
    val u = tok.toUpperCase
    val map = "01230127022455012623017202"
    val d = u.map(c => map(c - 'A'))
    val d7 = d.filter(_ != '7')
    val dc = d7.foldLeft(new StringBuilder) { (b, c) =>
      if (b.isEmpty || b.last != c) b += c else b
    }.toString
    val body = if (d.head == '7') dc else dc.drop(1)
    u.head.toString + body.filter(_ != '0').padTo(3, '0').take(3)
  }

  test("oracle replay algorithm == builtin over a letter fuzz") {
    val rng = new scala.util.Random(7)
    // alphabet rich in h/w, vowels, and same-code consonant families
    val alpha = "aehwioscgkzdtbfpvlmnrxy"
    for (_ <- 0 until 5000) {
      val tok = (0 to rng.nextInt(11)).map(_ => alpha(rng.nextInt(alpha.length))).mkString
      assert(replay(tok) == sx(tok), s"replay($tok)=${replay(tok)} builtin=${sx(tok)}")
    }
  }

  test("vocabulary / codeBlocks / candidatePairs over a tiny corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Robert and Rupert met Ashcraft; ashcroft was 42 miles away"),
      (2L, "the white who czar robert")).toDF("doc_id", "text")
    val vocab = Phonetic.vocabulary(docs, "text")
    val toks = vocab.as[String].collect().toSet
    // lowercased, letter-only (42 excluded), distinct across docs
    assert(toks.contains("robert") && toks.contains("ashcroft"))
    assert(!toks.exists(_.exists(c => !c.isLetter || c.isUpper)))

    val blocks = Phonetic.codeBlocks(vocab)
      .as[(String, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(blocks("R163")._2 == 2L) // robert + rupert
    assert(blocks("R163")._3 == "robert" && blocks("R163")._4 == "rupert")
    assert(blocks("A261")._2 == 2L) // ashcraft + ashcroft

    val pairs = Phonetic.candidatePairs(vocab)
      .as[(String, String, String, Int, Boolean)].collect()
    val byPair = pairs.map(p => (p._1, p._2) -> p).toMap
    // idA < idB, unique, same-code only
    assert(pairs.forall(p => p._1 < p._2) && byPair.size == pairs.length)
    assert(pairs.forall(p => sx(p._1) == p._3 && sx(p._2) == p._3))
    val rr = byPair(("robert", "rupert"))
    assert(rr._4 == 2 && rr._5) // lev 2 -> match at the default bound
    val aa = byPair(("ashcraft", "ashcroft"))
    assert(aa._4 == 1 && aa._5)
  }
}

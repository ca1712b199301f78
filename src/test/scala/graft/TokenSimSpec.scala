package graft

import graft.functions.{JaroWinkler, JaroWinklerKernel}
import graft.operators.TokenSim
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** TF-IDF cosine + Monge–Elkan comparators: hand-computed goldens on a
  * tiny corpus, zero-weight token behavior, empty-overlap behavior, and
  * mean-of-max structure/bounds of ME with the JW inner similarity. */
class TokenSimSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def docsDf(rows: (String, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("id", "text").select(col("id"), TokenSim.tokens(col("text")).as("toks"))
  }
  private def pairsDf(rows: (String, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("idA", "idB")
  }

  test("tfidf cosine: hand-computed golden on a 3-doc corpus") {
    // idf: a,b -> ln(3/2); c,d -> ln 3; z appears in ALL docs -> weight 0
    val docs = docsDf("d1" -> "a b c z", "d2" -> "a b d z", "d3" -> "x y z")
    val got = TokenSim.tfidfCosine(docs, pairsDf("d1" -> "d2", "d1" -> "d3"))
      .orderBy("idB").collect()
    val L = math.log(3.0 / 2.0); val M = math.log(3.0)
    val expect = (2 * L * L) / (2 * L * L + M * M) // identical norms both sides
    val r12 = got(0)
    assert(r12.getAs[Long]("shared_tokens") == 2)
    assert(math.abs(r12.getAs[Double]("cosine") -
      math.rint(expect * 1e6) / 1e6) < 1e-12)
    val r13 = got(1) // no shared positive-weight token
    assert(r13.getAs[Long]("shared_tokens") == 0)
    assert(r13.getAs[Double]("cosine") == 0.0)
  }

  test("tfidf cosine: raw term counts matter (tf weighting)") {
    val docs = docsDf("d1" -> "a a a b", "d2" -> "a b", "d3" -> "q r")
    val got = TokenSim.tfidfCosine(docs, pairsDf("d1" -> "d2")).collect()(0)
    // w(a) = cnt·ln(3/2): d1 has 3a,1b; d2 has 1a,1b. cos = (3+1)/(sqrt(10)·sqrt(2))
    val expect = 4.0 / (math.sqrt(10.0) * math.sqrt(2.0))
    assert(math.abs(got.getAs[Double]("cosine") - math.rint(expect * 1e6) / 1e6) < 1e-12)
    assert(got.getAs[Long]("shared_tokens") == 2)
  }

  test("monge-elkan: identity, bounds, asymmetry, mean-of-max golden") {
    val s = spark; import s.implicits._
    JaroWinkler.register(s)
    def jw(a: String, b: String) =
      JaroWinklerKernel.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))
    val df = Seq(
      (Seq("abc", "def"), Seq("abc", "def")),   // identical sets -> 1.0
      (Seq("abc"), Seq("abd", "zzz")),          // golden: max picks abd
      (Seq("abc", "qqq"), Seq("abc")))          // asymmetric witness
      .toDF("tA", "tB")
      .select(TokenSim.mongeElkan(col("tA"), col("tB")).as("ab"),
        TokenSim.mongeElkan(col("tB"), col("tA")).as("ba"))
      .collect()
    assert(df(0).getDouble(0) == 1.0 && df(0).getDouble(1) == 1.0)
    val g = math.max(jw("abc", "abd"), jw("abc", "zzz"))
    assert(math.abs(df(1).getDouble(0) - g) < 1e-12)
    // me(b->a) for the asymmetric case: every b-token has a perfect
    // a-side partner, while a's "qqq" drags the a->b mean down
    assert(df(2).getDouble(1) == 1.0)
    assert(df(2).getDouble(0) < 1.0 && df(2).getDouble(0) >= 0.0)
    assert(math.abs(df(2).getDouble(0) - (1.0 + jw("qqq", "abc")) / 2.0) < 1e-12)
  }

  private def softPair(docs: org.apache.spark.sql.DataFrame,
      a: String, b: String): (Double, Double) = {
    JaroWinkler.register(spark) // order-independent: lambda-inner jw
    val wl = TokenSim.softWeightLists(docs)
    val r = pairsDf(a -> b)
      .join(wl.select(col("id").as("idA"), col("wl").as("tA")), Seq("idA"))
      .join(wl.select(col("id").as("idB"), col("wl").as("tB")), Seq("idB"))
      .select(TokenSim.softTfIdf(col("tA"), col("tB")),
        TokenSim.softTfIdf(col("tB"), col("tA")))
      .collect()(0)
    (r.getDouble(0), r.getDouble(1))
  }

  test("soft-tfidf: self-similarity is exactly 1 (L2-normalized weights)") {
    val docs = docsDf("d1" -> "alpha beta", "d2" -> "gamma beta", "d3" -> "x y")
    val (ab, ba) = softPair(docs, "d1", "d1")
    assert(ab == 1.0 && ba == 1.0)
  }

  test("soft-tfidf: fuzzy partner above θ contributes, recomputed by hand") {
    def jw(a: String, b: String) = math.rint(JaroWinklerKernel.jaroWinkler(
      UTF8String.fromString(a), UTF8String.fromString(b)) * 1e6) / 1e6
    assert(jw("alpha", "alphq") >= TokenSim.SoftTfIdfTheta) // the fuzzy hit
    val docs = docsDf("d1" -> "alpha beta", "d2" -> "alphq beta", "d3" -> "x y")
    // weights: alpha/alphq df=1 -> ln3; beta df=2 -> ln(3/2); both docs
    // have the same norm, so V is shared
    val l3 = math.log(3.0); val l15 = math.log(1.5)
    val nrm = math.sqrt(l3 * l3 + l15 * l15)
    val expect = (l3 / nrm) * (l3 / nrm) * jw("alpha", "alphq") +
      (l15 / nrm) * (l15 / nrm) * 1.0
    val (ab, ba) = softPair(docs, "d1", "d2")
    assert(math.abs(ab - math.rint(expect * 1e6) / 1e6) < 1e-9, s"ab=$ab")
    assert(ab == ba) // best partners coincide both ways here
  }

  test("soft-tfidf: best partner below θ contributes zero") {
    val docs = docsDf("d1" -> "qqqqq beta", "d2" -> "wwwww beta", "d3" -> "x y")
    val l15 = math.log(1.5); val l3 = math.log(3.0)
    val nrm = math.sqrt(l3 * l3 + l15 * l15)
    val expect = (l15 / nrm) * (l15 / nrm) // only beta·beta survives
    val (ab, _) = softPair(docs, "d1", "d2")
    assert(math.abs(ab - math.rint(expect * 1e6) / 1e6) < 1e-9, s"ab=$ab")
  }

  test("soft-tfidf: all-universal-token docs keep their row at 0.0") {
    // every token of d3 appears in all docs -> weight 0 -> empty list
    val docs = docsDf("d1" -> "z w alpha", "d2" -> "z w beta", "d3" -> "z w")
    val (ab, ba) = softPair(docs, "d1", "d3")
    assert(ab == 0.0 && ba == 0.0)
  }
}

package graft

import graft.functions.{JaroWinkler, JaroWinklerKernel}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Jaro / Jaro–Winkler comparator: published golden values (pinned to
  * DuckDB's independent implementation — the er_jaro_winkler oracle),
  * metric properties, a randomized differential against a test-local
  * char-based reference, and the codegen'd DataFrame surface. */
class JaroWinklerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def jw(a: String, b: String): Double =
    JaroWinklerKernel.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))
  private def j(a: String, b: String): Double =
    JaroWinklerKernel.jaro(UTF8String.fromString(a), UTF8String.fromString(b))

  test("golden values match DuckDB's implementation (probed literals)") {
    val cases = Seq(
      // (a, b, expected jw, expected jaro) — DuckDB 1.0.0 output
      ("martha", "marhta", 0.9611111111111111, 0.9444444444444445),
      ("dwayne", "duane", 0.8400000000000001, 0.8222222222222223),
      ("dixon", "dicksonx", 0.8133333333333334, 0.7666666666666666),
      // prefix 4 but jaro <= 0.7: NO boost
      ("abcdwxyzijkl", "abcdmnopqrst", 0.5555555555555555, 0.5555555555555555),
      // jaro > 0.7 but prefix 0: boost is a no-op
      ("CRATE", "TRACE", 0.7333333333333334, 0.7333333333333334),
      // prefix capped at 4 even with a 20-char common run
      ("x" * 20 + "abc", "x" * 20 + "def", 0.9478260869565217, 0.9130434782608696),
      ("foo/bar.c", "foo/baz.c", 0.9555555555555556, 0.9259259259259259),
      ("abcd", "abdc", 0.9333333333333333, 0.9166666666666666),
      ("aaaa", "aaaab", 0.96, 0.9333333333333332))
    for ((a, b, ejw, ej) <- cases) {
      assert(math.abs(jw(a, b) - ejw) < 1e-12, s"jw($a,$b)=${jw(a, b)}")
      assert(math.abs(j(a, b) - ej) < 1e-12, s"jaro($a,$b)=${j(a, b)}")
    }
  }

  test("empty-string convention matches DuckDB: either side empty -> 0.0 (including both)") {
    assert(jw("", "") == 0.0 && jw("a", "") == 0.0 && jw("", "a") == 0.0)
    assert(j("", "") == 0.0)
  }

  test("properties: symmetric, bounded, 1.0 iff equal non-empty, boost never lowers") {
    val rng = new scala.util.Random(42)
    def randStr() = {
      val n = rng.nextInt(12)
      (0 until n).map(_ => ('a' + rng.nextInt(6)).toChar).mkString
    }
    for (_ <- 1 to 2000) {
      val a = randStr(); val b = randStr()
      val x = jw(a, b); val y = jw(b, a)
      assert(x == y, s"symmetry: $a/$b")
      assert(x >= 0.0 && x <= 1.0)
      assert(jw(a, b) >= j(a, b) - 1e-15, "winkler boost never lowers jaro")
      if (a.nonEmpty) assert(jw(a, a) == 1.0)
      if (a.nonEmpty && b.nonEmpty && x == 1.0) assert(a == b, s"$a/$b")
    }
  }

  /** Independent char-based reference (the textbook formulation over
    * Java chars, flags found via a different loop structure). */
  private def refJaro(s1: String, s2: String): Double = {
    if (s1.isEmpty || s2.isEmpty) return 0.0
    val md = math.max(math.max(s1.length, s2.length) / 2 - 1, 0)
    val f1 = Array.fill(s1.length)(false)
    val f2 = Array.fill(s2.length)(false)
    var m = 0
    for (i <- s1.indices) {
      var found = false
      for (jj <- math.max(0, i - md) until math.min(s2.length, i + md + 1) if !found)
        if (!f2(jj) && s1(i) == s2(jj)) { f1(i) = true; f2(jj) = true; m += 1; found = true }
    }
    if (m == 0) return 0.0
    val m1 = s1.indices.filter(f1).map(s1(_))
    val m2 = s2.indices.filter(f2).map(s2(_))
    val t = m1.zip(m2).count { case (x, y) => x != y } / 2
    (m.toDouble / s1.length + m.toDouble / s2.length + (m - t).toDouble / m) / 3.0
  }
  private def refJw(a: String, b: String): Double = {
    val jj = refJaro(a, b)
    if (jj <= 0.7) jj
    else {
      val p = a.zip(b).take(4).takeWhile { case (x, y) => x == y }.size
      jj + p * 0.1 * (1.0 - jj)
    }
  }

  test("randomized differential vs independent reference (5000 ASCII pairs)") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 5000) {
      val a = (0 until rng.nextInt(16)).map(_ => ('a' + rng.nextInt(8)).toChar).mkString
      val b = (0 until rng.nextInt(16)).map(_ => ('a' + rng.nextInt(8)).toChar).mkString
      assert(math.abs(jw(a, b) - refJw(a, b)) < 1e-12, s"$a / $b")
      assert(math.abs(j(a, b) - refJaro(a, b)) < 1e-12, s"jaro $a / $b")
    }
  }

  test("DataFrame surface: codegen'd expression, null-safe, inside WholeStageCodegen") {
    import spark.implicits._
    JaroWinkler.register(spark)
    val df = Seq(
      (Option("martha"), Option("marhta")),
      (Option("dixon"), Option("dicksonx")),
      (None: Option[String], Option("x")),
      (Option("x"), None: Option[String]))
      .toDF("a", "b")
      // repartition keeps ConvertToLocalRelation from folding the whole
      // projection into a LocalTableScan — the plan lock below needs the
      // expression to actually run inside generated code
      .repartition(1)
      .select(JaroWinkler.jaroWinklerSim(col("a"), col("b")).as("jw"),
        JaroWinkler.jaroSim(col("a"), col("b")).as("jaro"))
    val rows = df.collect()
    assert(math.abs(rows(0).getDouble(0) - 0.9611111111111111) < 1e-12)
    assert(math.abs(rows(1).getDouble(0) - 0.8133333333333334) < 1e-12)
    assert(rows(2).isNullAt(0) && rows(3).isNullAt(0), "null propagation")
    // under AQE the executed-plan string marks whole-stage codegen stages
    // with the `*(n)` prefix rather than the literal node name — assert the
    // projection carrying the expressions runs inside one
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[jarowinklersimilarity""".r.findFirstIn(plan).isDefined,
      s"expected the jaro projection inside a WholeStageCodegen stage:\n$plan")
    // and the SQL surface resolves through the registry
    val viaSql = spark.sql("SELECT jaro_winkler_sim('dwayne', 'duane') AS s").collect()(0).getDouble(0)
    assert(math.abs(viaSql - 0.8400000000000001) < 1e-12)
  }
}

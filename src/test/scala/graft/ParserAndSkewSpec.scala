package graft

import graft.model.FileRow
import graft.operators.{Blocking, ParseStage}
import graft.parse.CodeParser
import org.scalatest.funsuite.AnyFunSuite

class ParserAndSkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("parser: determinism, nesting, comments, strings, cap") {
    val src =
      """def foo(a, b) { // comment stripped
        |  val s = "a string literal";
        |  if (a < 10) { return b[a]; }
        |  /* block
        |     comment */
        |  # hash comment
        |}""".stripMargin
    val p1 = CodeParser.parse(src)
    val p2 = CodeParser.parse(src)
    assert(p1.tree.labels.toSeq == p2.tree.labels.toSeq)
    assert(!p1.truncated)
    // nesting: function body {} + if body {} scopes exist
    assert(p1.tree.labels.count(_ == "{}") == 2)
    assert(p1.tree.labels.count(_ == "()") == 2)
    assert(p1.tree.labels.count(_ == "[]") == 1)
    // comments stripped
    assert(!p1.tree.labels.exists(_.contains("comment")))
    // string literal collapsed to one $-prefixed leaf
    assert(p1.tree.labels.count(_.startsWith("$")) == 1)

    // unbalanced closers ignored, unclosed scopes close at EOF
    val weird = CodeParser.parse(")))} val x = ( { (")
    assert(weird.tree.n > 1)

    // node cap + truncated flag
    val big = CodeParser.parse((1 to 10000).map(i => s"tok$i").mkString(" "),
      CodeParser.ParseConfig(maxNodes = 128))
    assert(big.truncated && big.tree.n <= 128)
  }

  test("lexEvents: parse's count bookkeeping is the exact cap formula over the event stream") {
    // the formula the er_tree_stats DuckDB oracle applies to the dumped
    // event stream — any drift between lexEvents and parse fails here
    def check(content: String, maxNodes: Int): Unit = {
      val p = CodeParser.parse(content, CodeParser.ParseConfig(maxNodes = maxNodes))
      val ev = CodeParser.lexEvents(content)
      assert(p.tree.labels.length == math.min(1 + ev.length, maxNodes),
        s"n mismatch for ${content.take(40)}... at cap $maxNodes")
      assert(p.nTokens == ev.take(maxNodes - 1).count(_ == 'L'),
        s"nTokens mismatch for ${content.take(40)}... at cap $maxNodes")
      assert(p.truncated == (ev.length > maxNodes - 1),
        s"truncated mismatch for ${content.take(40)}... at cap $maxNodes")
    }
    val nasty = Seq(
      "", "   \n\t ", "// only a comment", "/* unterminated block",
      "# hash\ncode()", "\"unterminated string", "'a' \"b\" 'c\\'d'",
      "a(b{c[d]e}f)g", ")}] unbalanced closers first (x)",
      "x = \"s\\\"t\"; y = 3.14ab_c", "(((((((((((((((((((",
      "id0 id1 id2 id3 id4 id5 id6 id7 id8 id9")
    val corpus = graft.sources.CorpusGen.corpus(spark, "/root/testdata/sf0.001")
      .collect().map(_.content).take(200)
    for (c <- nasty ++ corpus; mx <- Seq(4, 10, 2048)) check(c, mx)
  }

  test("size-bucket dual emission: neighbors within slack always share a bucket") {
    val cfg = Blocking.BlockingConfig()
    val mh = Array.fill(cfg.mh.numHashes)(7L)
    for (n <- 1 to 400; d <- 0 to cfg.sizeSlack) {
      val k1 = Blocking.keysFor("x", n, mh, cfg).toSet
      val k2 = Blocking.keysFor("x", n + d, mh, cfg).toSet
      assert(k1.intersect(k2).nonEmpty, s"n=$n d=$d share no block key")
    }
  }

  test("hot key skew: N identical files stay capped and pipeline completes") {
    import spark.implicits._
    // 300 byte-identical files = one giant exact-dup block
    val hot = (0 until 300).map(i =>
      FileRow("r", s"p$i", f"c$i%04d", "scala", "def f() { val x = 1; }", groupId = 7L))
    val files = hot.toDS()
    val trees = ParseStage.parse(files)
    val pairs = Blocking.candidatePairs(trees)
    val nPairs = pairs.count()
    val cap = Blocking.BlockingConfig().maxBlockSize
    // capped: at most C(cap,2) pairs from the hot block (not C(300,2)=44850)
    assert(nPairs <= cap.toLong * (cap - 1) / 2,
      s"$nPairs pairs leaked past the per-block cap")
    assert(nPairs > 0)
    // and the full pipeline still produces one cluster over the capped members
    val r = Pipeline.run(spark, files)
    val clustered = r.clusters.groupBy("clusterId").count()
      .orderBy(org.apache.spark.sql.functions.desc("count")).head()
    assert(clustered.getLong(1) >= cap)
  }
}

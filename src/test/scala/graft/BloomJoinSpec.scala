package graft

import graft.operators.BloomJoin
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def li = spark.read.parquet(s"$dir/lineitem.parquet")
    .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
  private def bigParts = spark.read.parquet(s"$dir/part.parquet")
    .where(col("p_size") >= 45).select(col("p_partkey"), col("p_size"))

  test("bloom-prefiltered join result is EXACTLY the plain join (no false negatives)") {
    val bloomed = BloomJoin.prefilteredJoin(li, bigParts,
        "l_partkey", "p_partkey", expectedItems = 100000L, fpp = 0.01)
      .select(col("l_orderkey"), col("l_linenumber"), col("p_partkey"))
    val plain = li.join(bigParts, col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("p_partkey"))
    assert(bloomed.count() == plain.count())
    assert(bloomed.except(plain).isEmpty && plain.except(bloomed).isEmpty)
  }

  test("prefilter prunes most non-matching probe rows at fpp=0.01") {
    val bloom = BloomJoin.buildBloom(bigParts, "p_partkey", 100000L, 0.01)
    val total = li.count()
    val kept = BloomJoin.prefilter(li, "l_partkey", bloom).count()
    val matching = li.join(bigParts.select(col("p_partkey")),
      col("l_partkey") === col("p_partkey"), "left_semi").count()
    assert(kept >= matching, "a false negative dropped a matching row")
    // false positives ≤ fpp of the non-matching rows, with slack
    assert(kept - matching <= math.max(10L, (0.05 * (total - matching)).toLong),
      s"bloom passed too much: kept=$kept matching=$matching total=$total")
  }

  test("plan: might_contain filter sits on the probe scan, BELOW the join's exchange") {
    val s = BloomJoin.prefilteredJoin(li, bigParts,
        "l_partkey", "p_partkey", expectedItems = 100000L, fpp = 0.01)
      .queryExecution.explainString(FormattedMode)
    assert(s.contains("might_contain"), s"bloom filter absent from plan\n$s")
    assert(s.contains("SortMergeJoin") || s.contains("ShuffledHashJoin"),
      s"bloom demo must exercise the non-broadcast join regime\n$s")
    // the prune must run pre-exchange: in the formatted tree (printed
    // top-down; children below parents execute FIRST), the
    // might_contain Filter's line must sit below an Exchange line —
    // i.e. the filter feeds the shuffle, not the other way round
    val filterId = "\\((\\d+)\\) Filter".r.findAllMatchIn(s).map(_.group(1).toInt)
      .find(id => s.linesIterator.dropWhile(!_.startsWith(s"($id) Filter"))
        .take(5).exists(_.contains("might_contain")))
    assert(filterId.isDefined, s"no Filter detail block with might_contain\n$s")
    val tree = s.linesIterator.takeWhile(_.trim.nonEmpty).toSeq
    val fLine = tree.indexWhere(_.endsWith(s"Filter (${filterId.get})"))
    val eLine = tree.indexWhere(_.contains("Exchange"))
    assert(eLine >= 0 && fLine > eLine,
      s"might_contain filter not below the exchange (filter@$fLine, exchange@$eLine)\n$s")
  }

  test("null probe keys are dropped, matching inner-join semantics") {
    import spark.implicits._
    val big = Seq(Some(1L), None, Some(2L), Some(99L)).toDF("k")
    val small = Seq(1L, 2L).toDF("sk")
    val bloom = BloomJoin.buildBloom(small, "sk", 100L, 0.01)
    val kept = BloomJoin.prefilter(big, "k", bloom)
      .as[Option[Long]].collect().flatten.toSet
    assert(kept.subsetOf(Set(1L, 2L, 99L)) && Set(1L, 2L).subsetOf(kept))
    val joined = BloomJoin.prefilteredJoin(big, small, "k", "sk", 100L, 0.01)
    assert(joined.select(col("k")).as[Long].collect().toSet == Set(1L, 2L))
  }
}

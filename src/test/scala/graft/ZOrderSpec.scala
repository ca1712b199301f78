package graft

import graft.operators.ZOrder
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def pts = spark.read.parquet(s"$dir/lineitem.parquet")
    .select(col("l_partkey").cast("long").as("x"),
      col("l_orderkey").cast("long").as("y"),
      col("l_linenumber"), col("l_quantity"))

  private lazy val st = {
    val r = pts.agg(min(col("x")), max(col("x")), min(col("y")), max(col("y"))).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("interleave is a bijection on the normalized grid (decode recovers both dims)") {
    val bits = ZOrder.DimBits
    val rows = spark.range(0, 1L << bits, 37) // stride keeps it fast
      .select((col("id") % (1L << bits)).as("xn"),
        ((col("id") * 7919) % (1L << bits)).as("yn"))
      .withColumn("z", ZOrder.interleave(col("xn"), col("yn"), bits))
    // decode: x = even bits of z, y = odd bits
    val xBack = (0 until bits).map(i =>
      shiftleft(shiftright(col("z"), 2 * i).bitwiseAND(lit(1L)), i)).reduce(_ bitwiseOR _)
    val yBack = (0 until bits).map(i =>
      shiftleft(shiftright(col("z"), 2 * i + 1).bitwiseAND(lit(1L)), i)).reduce(_ bitwiseOR _)
    val bad = rows.where(xBack =!= col("xn") || yBack =!= col("yn")).count()
    assert(bad == 0)
  }

  test("z layout prunes on BOTH dims; linear layout cannot serve the second dim") {
    val (xmn, xmx, ymn, ymx) = st
    val shift = ZOrder.DimBits - ZOrder.PrefixBits
    val z = ZOrder.withZFile(pts, col("x"), col("y"), xmn, xmx, ymn, ymx)
    val lin = pts.withColumn("zfile",
      shiftright(ZOrder.normalize(col("x"), lit(xmn), lit(xmx)), shift))
    val yBox = Some((ymn + (ymx - ymn) * 45 / 100, ymn + (ymx - ymn) * 55 / 100))
    def scanned(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val idx = ZOrder.minMaxIndex(df, "zfile", col("x"), col("y"))
      val n = idx.count()
      val s = ZOrder.overlappingFiles(idx, "zfile", None, yBox).count()
      (s, n)
    }
    val (zScan, zAll) = scanned(z)
    val (lScan, lAll) = scanned(lin)
    // a y-only predicate: the linear (x-sorted) layout scans everything,
    // the z layout prunes most tiles
    assert(lScan == lAll, s"x-sorted layout unexpectedly pruned on y ($lScan/$lAll)")
    assert(zScan * 2 <= zAll, s"z layout pruned too little on y ($zScan/$zAll)")
  }

  test("pruned read ≡ full-scan filter, with planning-time partition pruning in the plan") {
    val (xmn, xmx, ymn, ymx) = st
    val root = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    ZOrder.writeZOrdered(pts, root, col("x"), col("y"), xmn, xmx, ymn, ymx)
    val index = ZOrder.minMaxIndex(
      ZOrder.withZFile(pts, col("x"), col("y"), xmn, xmx, ymn, ymx),
      "zfile", col("x"), col("y"))
    val xr = Some((xmn + (xmx - xmn) * 45 / 100, xmn + (xmx - xmn) * 55 / 100))
    val yr = Some((ymn + (ymx - ymn) * 45 / 100, ymn + (ymx - ymn) * 55 / 100))
    val boxPred = col("x").between(xr.get._1, xr.get._2) &&
      col("y").between(yr.get._1, yr.get._2)

    val pruned = ZOrder.prunedRead(spark, root, index, xr, yr).where(boxPred)
    val full = spark.read.parquet(root).where(boxPred)
    // exactness: pruning by the min/max envelope loses nothing
    assert(pruned.count() == full.count())
    assert(pruned.select(col("x"), col("y"), col("l_linenumber"))
      .except(full.select(col("x"), col("y"), col("l_linenumber"))).isEmpty)

    val s = pruned.queryExecution.explainString(FormattedMode)
    assert(s.contains("PartitionFilters") && s.contains("zfile"),
      s"zfile partition filter missing from scan\n$s")
    // and the prune is real: fewer partition dirs read than exist
    val nAll = index.count()
    val nRead = ZOrder.overlappingFiles(index, "zfile", xr, yr).count()
    assert(nRead < nAll / 4, s"box read $nRead of $nAll partitions — not selective")
  }
}

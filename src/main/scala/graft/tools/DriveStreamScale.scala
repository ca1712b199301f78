package graft.tools

import graft.Pipeline
import graft.model.FileRow
import graft.sources.{CorpusGen, ParquetTableIO}
import graft.streaming.StreamingEr
import org.apache.spark.sql.SparkSession

/** Per-batch wall-clock comparison of the two incremental-ER state
  * layouts as history accumulates. The in-memory/checkpointed path
  * re-caps the FULL cumulative block index each batch (cost grows with
  * history); the bucketed path merges only the delta against
  * pre-distributed capped state (cost tracks the batch). Scoring and
  * clustering are identical in both, so the per-batch gap isolates the
  * state-management term the 10^12-file deployment cares about.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... GRAFT_STREAM_BATCHES=12 \
  *   sbt -batch "runMain graft.tools.DriveStreamScale"
  * Prints one JSON line per (path, batch).
  */
object DriveStreamScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mult = sys.env.getOrElse("GRAFT_BENCH_MULT", "1").toInt
    val nBatches = sys.env.getOrElse("GRAFT_STREAM_BATCHES", "12").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val files = CorpusGen.corpus(spark, sfDir, mult).persist()
    files.count()
    def part(b: Int) = files.filter((f: FileRow) =>
      math.floorMod(graft.util.Hashing.hashString(f.path), nBatches) == b)

    // in-memory (full-index) path
    var st: Option[StreamingEr.ErState] = None
    for (b <- 0 until nBatches) {
      val t0 = System.nanoTime()
      st = Some(StreamingEr.processBatch(spark, part(b), st))
      val w = (System.nanoTime() - t0) / 1e9
      println(f"""{"path":"memory","batch":$b,"wall_sec":$w%.3f}""")
    }
    val memClusters = st.get.clusters.collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // release the memory arm's entire cached state before timing the
    // bucketed arm — resident blocks would otherwise pressure the block
    // manager during phase 2 and bias the comparison
    st.foreach(_.release())

    // bucketed (delta-merge) path — fresh storage root
    val root = java.nio.file.Files.createTempDirectory("graft_stream_scale").toString
    val io = new ParquetTableIO(root)
    var bst: StreamingEr.ErState = null
    for (b <- 0 until nBatches) {
      val t0 = System.nanoTime()
      bst = StreamingEr.processBatchBucketed(spark, part(b), io, root,
        numBuckets = cpus.toInt)
      val w = (System.nanoTime() - t0) / 1e9
      println(f"""{"path":"bucketed","batch":$b,"wall_sec":$w%.3f}""")
    }
    val buckClusters = bst.clusters.collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val equal = memClusters == buckClusters
    println(s"""{"mem_clusters":${memClusters.size},"bucketed_clusters":${buckClusters.size},"clusters_equal":$equal}""")
    require(equal, "state layouts diverged: in-memory and bucketed cluster sets differ")
    spark.stop()
  }
}

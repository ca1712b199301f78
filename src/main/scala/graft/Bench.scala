package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR at local[SPARK_GRAFT_CPUS], then measures the
  * north-star metric — scored candidate pairs/sec through the ZSS
  * mapPartitions stage — on a corpus fanned out by GRAFT_BENCH_MULT
  * (default 4). Prints exactly ONE JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val mult = sys.env.getOrElse("GRAFT_BENCH_MULT", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the shared ER pipeline before the per-query sweep and report
    // its build as its own line — otherwise the first er_* query timed
    // silently absorbs the one-time parse/block/score/cluster build and
    // per-query numbers stop meaning anything.
    val tWarm = System.nanoTime()
    val warmOk =
      try { ErQueries.warm(spark, sfDir); true } catch { case _: Throwable => false }
    val warmSec = (System.nanoTime() - tWarm) / 1e9

    // the streaming-ER twin builds its own 2-batch incremental pipeline;
    // warm it separately so er_stream_clusters times a cache read and the
    // build cost is its own honest line
    val tStream = System.nanoTime()
    val streamOk =
      try { ErQueries.warmStream(spark, sfDir); true } catch { case _: Throwable => false }
    val streamSec = (System.nanoTime() - tStream) / 1e9

    // same attribution rule for the bucketed-state twin
    val tBStream = System.nanoTime()
    val bstreamOk =
      try { ErQueries.warmStreamBucketed(spark, sfDir); true } catch { case _: Throwable => false }
    val bstreamSec = (System.nanoTime() - tBStream) / 1e9

    // and for the memoized edit-script dump shared by er_edit_cost /
    // er_edit_scripts: build it here so both sweep lines time cache reads
    val tOps = System.nanoTime()
    val opsOk =
      try { ErQueries.warmEditScripts(spark, sfDir); true } catch { case _: Throwable => false }
    val opsSec = (System.nanoTime() - tOps) / 1e9

    // and the shared semantic-dedup pair table (q_semdedup_pairs /
    // q_semdedup_keepers both read it; the build is its own line)
    val tSem = System.nanoTime()
    val semOk =
      try { SimQueries.warmSemDedup(spark, sfDir); true } catch { case _: Throwable => false }
    val semSec = (System.nanoTime() - tSem) / 1e9

    // and the streaming-dedup twin (q_dedup_stream)
    val tDStream = System.nanoTime()
    val dstreamOk =
      try { TextQueries.warmStreamDedup(spark, sfDir); true } catch { case _: Throwable => false }
    val dstreamSec = (System.nanoTime() - tDStream) / 1e9

    // and the frozen Datasketches estimate tables (five q_theta_*/q_kll_*/
    // q_freq_* queries read them; the one-time build is its own line)
    val tDs = System.nanoTime()
    val dsOk =
      try { DsSketchQueries.warm(spark, sfDir); true } catch { case _: Throwable => false }
    val dsSec = (System.nanoTime() - tDs) / 1e9

    // and the Fellegi–Sunter layer (four er_fs_* queries share its
    // SNM-delta scoring + EM fit; the build is its own line)
    val tFs = System.nanoTime()
    val fsOk =
      try { ErQueries.warmFs(spark, sfDir); true } catch { case _: Throwable => false }
    val fsSec = (System.nanoTime() - tFs) / 1e9

    // and the 1:1 linkage layer (both er_link_* queries share its edge
    // derivation + checkpointed greedy-matching rounds)
    val tLink = System.nanoTime()
    val linkOk =
      try { ErQueries.warmLink(spark, sfDir); true } catch { case _: Throwable => false }
    val linkSec = (System.nanoTime() - tLink) / 1e9

    // and the PPRL layer (five er_pprl_* queries + the blocking-recall
    // channel share both encodings and the encoded-space pairs)
    val tPprl = System.nanoTime()
    val pprlOk =
      try { ErQueries.warmPprl(spark, sfDir); true } catch { case _: Throwable => false }
    val pprlSec = (System.nanoTime() - tPprl) / 1e9

    // and the truth-discovery layer (three er_truth_* queries share the
    // claims table + both 5-round fixpoints)
    val tTruth = System.nanoTime()
    val truthOk =
      try { ErQueries.warmTruth(spark, sfDir); true } catch { case _: Throwable => false }
    val truthSec = (System.nanoTime() - tTruth) / 1e9

    // and the pq-gram layer (profile table + structure block index,
    // shared by three er_pqgram_* queries and the recall channel)
    val tPq = System.nanoTime()
    val pqOk =
      try { ErQueries.warmPq(spark, sfDir); true } catch { case _: Throwable => false }
    val pqSec = (System.nanoTime() - tPq) / 1e9

    // and the streaming-truth twin (3-batch fold, one fixpoint per batch)
    val tSTruth = System.nanoTime()
    val struthOk =
      try { ErQueries.warmStreamTruth(spark, sfDir); true } catch { case _: Throwable => false }
    val struthSec = (System.nanoTime() - tSTruth) / 1e9

    // and the exact set-similarity layer (rare-first ordered shingle
    // frame + the four result frames, shared by q_setsim_join /
    // q_ppjoin / q_ppjoin_stats / q_cosine_simjoin — each line used to
    // rebuild the same frame from scratch, ~30 s per sweep)
    val tSetSim = System.nanoTime()
    val setsimOk =
      try { TextQueries.warmSetSim(spark, sfDir); true } catch { case _: Throwable => false }
    val setsimSec = (System.nanoTime() - tSetSim) / 1e9

    // A failed query reports elapsed -1 so breakage is visible in the
    // JSON instead of silently polluting the totals.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }

    val scoring = ScalingBench.measure(spark, sfDir, mult)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"""" +
        s""","cpus":$cpus,"bench_mult":$mult,"pipeline_build_sec":$warmSec""" +
        s""","pipeline_build_ok":$warmOk,"stream_build_sec":$streamSec""" +
        s""","stream_build_ok":$streamOk,"bstream_build_sec":$bstreamSec""" +
        s""","bstream_build_ok":$bstreamOk,"edit_scripts_build_sec":$opsSec""" +
        s""","edit_scripts_build_ok":$opsOk,"semdedup_build_sec":$semSec""" +
        s""","semdedup_build_ok":$semOk,"dstream_build_sec":$dstreamSec""" +
        s""","dstream_build_ok":$dstreamOk,"dsketch_build_sec":$dsSec""" +
        s""","dsketch_build_ok":$dsOk,"fs_build_sec":$fsSec""" +
        s""","fs_build_ok":$fsOk,"link_build_sec":$linkSec""" +
        s""","link_build_ok":$linkOk,"pprl_build_sec":$pprlSec""" +
        s""","pprl_build_ok":$pprlOk,"truth_build_sec":$truthSec""" +
        s""","truth_build_ok":$truthOk,"pq_build_sec":$pqSec""" +
        s""","pq_build_ok":$pqOk,"struth_build_sec":$struthSec""" +
        s""","struth_build_ok":$struthOk,"setsim_build_sec":$setsimSec""" +
        s""","setsim_build_ok":$setsimOk,"failed":${failed.mkString("[", ",", "]")}""" +
        s""","pairs_scored":${scoring.pairs}""" +
        s""","score_wall_sec":${scoring.wallSec},"pairs_per_sec":${scoring.pairsPerSec}""" +
        s""","dp_cells_per_sec":${scoring.cellsPerSec}}""")
    spark.stop()
  }
}

package graft

import graft.operators._
import graft.sources.CorpusGen
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Record-linkage pipeline queries (the engine's own operators). The
  * corpus is generated in Scala (deterministic, seed 42) so these are
  * rows-only checks for the driver; correctness is enforced by the
  * golden + property ScalaTest suites and the F1/cluster fixtures.
  * DuckDB-oracle-checkable queries over the driver's own parquet tables
  * live in [[RelQueries]] / [[TextQueries]].
  */
object ErQueries {

  private def pipeline(spark: SparkSession, sfDir: String): Pipeline.Result =
    Results.cached(spark, sfDir)

  /** Cache pipeline results per (session, sfDir) so Verify/Bench running
    * many queries do not re-run the whole DAG per query. Keyed by the
    * session too: a cached Dataset is bound to the session that built it,
    * so a second session in the same JVM must get its own build. */
  private object Results {
    private val cache =
      scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Pipeline.Result]
    def cached(spark: SparkSession, sfDir: String): Pipeline.Result =
      cache.getOrElseUpdate((spark, sfDir), {
        Pipeline.run(spark, CorpusGen.corpus(spark, sfDir))
      })
  }

  /** Force the shared pipeline's persisted stages once, so per-query
    * timings downstream measure the query, not the pipeline build. */
  def warm(spark: SparkSession, sfDir: String): Unit = {
    val r = Results.cached(spark, sfDir)
    r.trees.count()
    r.scores.count()
    r.clusters.count()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "er_trees" -> ((s, dir) => {
      pipeline(s, dir).trees.toDF()
        .select(col("id"), col("lang"), col("sha256"), col("n"), col("nTokens").as("n_tokens"))
        .orderBy(col("id"))
    }),
    "er_pairs" -> ((s, dir) => pipeline(s, dir).pairs.orderBy(col("idA"), col("idB"))),
    "er_scores" -> ((s, dir) => {
      pipeline(s, dir).scores.toDF()
        .select(col("idA"), col("idB"), col("dist"), col("isMatch"))
        .orderBy(col("idA"), col("idB"))
    }),
    "er_matches" -> ((s, dir) => pipeline(s, dir).matches.orderBy(col("idA"), col("idB"))),
    "er_clusters" -> ((s, dir) => pipeline(s, dir).clusters.orderBy(col("id"))),
    "er_cluster_sizes" -> ((s, dir) => {
      pipeline(s, dir).clusters
        .groupBy(col("clusterId")).agg(count(lit(1)).as("size"))
        .groupBy(col("size")).agg(count(lit(1)).as("n_clusters"))
        .orderBy(col("size"))
    }),
    "er_f1" -> ((s, dir) => {
      val r = pipeline(s, dir)
      Pipeline.pairwiseF1(r.scores, r.trees)
    }),
    "er_block_histogram" -> ((s, dir) => {
      Blocking.blockHistogram(pipeline(s, dir).trees, 64)
        .orderBy(col("lang"), col("size_bucket"))
    }),
    "er_metrics" -> ((s, dir) => {
      // metrics rows are per task ATTEMPT; dedupe to one per partition
      // (max) before summing so re-executions don't double-count
      pipeline(s, dir).metrics
        .groupBy(col("stage"), col("partitionId"))
        .agg(max(col("pairsScored")).as("p"), max(col("dpCells")).as("c"))
        .groupBy(col("stage"))
        .agg(
          count(lit(1)).as("n_partitions"),
          sum(col("p")).as("pairs_scored"),
          sum(col("c")).as("dp_cells"))
    }),
    // cluster cohesion diagnostics: per-cluster member count, matched
    // intra-edges, and worst intra-pair normalized distance — the
    // threshold-drift monitor a 100 TB deployment would watch
    "er_cluster_cohesion" -> ((s, dir) => {
      val r = pipeline(s, dir)
      val cl = r.clusters
      val edges = r.scores.toDF().where(col("isMatch"))
        .join(cl.withColumnRenamed("id", "idA").withColumnRenamed("clusterId", "cA"), "idA")
        .join(cl.withColumnRenamed("id", "idB").withColumnRenamed("clusterId", "cB"), "idB")
      val sizes = cl.groupBy(col("clusterId")).agg(count(lit(1)).as("n_members"))
      edges.where(col("cA") === col("cB"))
        .groupBy(col("cA").as("clusterId"))
        .agg(count(lit(1)).as("n_edges"),
          round(max(col("normDist")), 6).as("max_norm_dist"),
          round(avg(col("normDist")), 6).as("avg_norm_dist"))
        .join(sizes, "clusterId")
        .orderBy(col("clusterId"))
    }),
    // edit scripts for matched pairs through the reference's
    // return_operations surface (TreeDistOps) — one row per operation
    "er_edit_scripts" -> ((s, dir) => {
      import s.implicits._
      val r = pipeline(s, dir)
      val slim = r.trees.toDF().select(col("id"), col("labels"), col("lmds"), col("keyroots"))
      val sample = r.matches.orderBy(col("idA"), col("idB")).limit(50)
      val withTrees = sample
        .join(slim.withColumnRenamed("id", "idA")
          .withColumnRenamed("labels", "laA").withColumnRenamed("lmds", "lmA")
          .withColumnRenamed("keyroots", "krA"), "idA")
        .join(slim.withColumnRenamed("id", "idB")
          .withColumnRenamed("labels", "laB").withColumnRenamed("lmds", "lmB")
          .withColumnRenamed("keyroots", "krB"), "idB")
        .select(col("idA"), col("idB"), col("laA"), col("lmA"), col("krA"),
          col("laB"), col("lmB"), col("krB"))
        .as[(String, String, Seq[String], Seq[Int], Seq[Int], Seq[String], Seq[Int], Seq[Int])]
      withTrees.flatMap { case (idA, idB, laA, lmA, krA, laB, lmB, krB) =>
        val a = graft.zs.PTree(laA.toArray, lmA.toArray, krA.toArray)
        val b = graft.zs.PTree(laB.toArray, lmB.toArray, krB.toArray)
        val (cost, ops) = graft.zs.TreeDistOps.distanceWithOps(a, b)
        ops.zipWithIndex.map { case (op, i) =>
          (idA, idB, cost, i, op.op.toInt, op.aIdx, op.bIdx)
        }
      }.toDF("idA", "idB", "cost", "op_seq", "op", "a_idx", "b_idx")
        .orderBy(col("idA"), col("idB"), col("op_seq"))
    }),
    // the ZSS scorer through its SQL surface (custom Catalyst
    // Expression): same candidate pairs, distances via spark.sql
    "er_ted_sql" -> ((s, dir) => {
      graft.functions.TreeEditDistance.register(s)
      val r = pipeline(s, dir)
      val slim = r.trees.toDF().select(col("id"), col("labels"), col("lmds"), col("keyroots"))
      r.pairs
        .join(slim.withColumnRenamed("id", "idA")
          .withColumnRenamed("labels", "laA").withColumnRenamed("lmds", "lmA")
          .withColumnRenamed("keyroots", "krA"), "idA")
        .join(slim.withColumnRenamed("id", "idB")
          .withColumnRenamed("labels", "laB").withColumnRenamed("lmds", "lmB")
          .withColumnRenamed("keyroots", "krB"), "idB")
        .select(col("idA"), col("idB"),
          graft.functions.TreeEditDistance.treeEditDistance(
            col("laA"), col("lmA"), col("krA"),
            col("laB"), col("lmB"), col("krB")).as("dist"))
        .orderBy(col("idA"), col("idB"))
    }),
    "er_sha_invariant" -> ((s, dir) => {
      // per-row invariant (input_hint): sha256 recomputed from the raw
      // corpus equals the value the parse stage carried through
      import s.implicits._
      val files = CorpusGen.corpus(s, dir)
      val raw = files.map(f => (graft.util.Hashing.rowId128Hex(f.repo, f.path, f.commit),
        graft.util.Hashing.sha256Hex(f.content))).toDF("id", "sha_raw")
      pipeline(s, dir).trees.toDF().select(col("id"), col("sha256"))
        .join(raw, "id")
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("sha256") === col("sha_raw"), 1L).otherwise(0L)).as("n_equal"))
    })
  )

  def oracleSql: Map[String, String] = Map.empty
}

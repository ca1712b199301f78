package graft

import graft.model._
import graft.operators._
import graft.parse.CodeParser
import graft.sources.TableIO
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** End-to-end record-linkage pipeline:
  * scan → parse → block → pair → ZSS-score → threshold → cluster.
  *
  * Stage DAG + shuffle budget (explicit, per north_rule):
  *  1. parse      — narrow map, 0 shuffles
  *  2. pairs      — 1 shuffle (groupBy block key) + 1 (pair distinct)
  *  3. score      — 2 salted equi-joins (tree fetch) + the mapPartitions
  *                  DP; AQE skew split enabled on these shuffles
  *  4. cluster    — O(log n) rounds × 2 shuffles, lineage truncated per
  *                  round
  * With `io` set, every stage persists to a table and is skipped on
  * re-run if its `_SUCCESS`-gated output exists — resume-from-checkpoint
  * at stage granularity.
  */
object Pipeline {

  final case class Config(
      tau: Double = 0.08,
      salts: Int = 8,
      parse: CodeParser.ParseConfig = CodeParser.defaultConfig,
      blocking: Blocking.BlockingConfig = Blocking.BlockingConfig(),
      io: Option[TableIO] = None)

  final case class Result(
      trees: Dataset[TreeRow],
      pairs: DataFrame,
      scores: Dataset[ScoreRow],
      matches: DataFrame,
      clusters: DataFrame,
      metrics: DataFrame)

  /** Session defaults every entry point should use. AQE on, skew-join
    * split on — the pair-generation and tree-fetch shuffles are the
    * documented skew points. */
  def tune(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
  }

  def run(spark: SparkSession, files: Dataset[FileRow], cfg: Config = Config()): Result = {
    import spark.implicits._
    tune(spark)

    // -- stage: parse ------------------------------------------------------
    val trees: Dataset[TreeRow] = staged(spark, cfg, "trees") {
      ParseStage.parse(files, cfg.parse, cfg.blocking.mh).toDF()
    }.as[TreeRow].persist(StorageLevel.MEMORY_AND_DISK)

    // -- stage: candidate pairs -------------------------------------------
    val pairs = staged(spark, cfg, "pairs") {
      Blocking.candidatePairs(trees, cfg.blocking)
    }

    // -- stage: score ------------------------------------------------------
    val metricsAcc = new org.apache.spark.util.CollectionAccumulator[PartMetrics]
    spark.sparkContext.register(metricsAcc, "graft.score.partMetrics")
    // persist: matches, clusters, F1 and metrics all read scores — without
    // it every downstream action re-runs the (expensive) DP stage
    val scores: Dataset[ScoreRow] = staged(spark, cfg, "scores") {
      val pt = Scoring.attachTrees(pairs, trees, cfg.salts)
      Scoring.score(pt, cfg.tau, Some(metricsAcc)).toDF()
    }.as[ScoreRow].persist(StorageLevel.MEMORY_AND_DISK)

    // -- stage: matches + clusters ----------------------------------------
    val matches = staged(spark, cfg, "matches") { Scoring.matches(scores) }
    val clusters = staged(spark, cfg, "clusters") {
      Clustering.connectedComponents(matches, trees.toDF().select($"id"))
    }

    // -- per-partition lineage/metrics ------------------------------------
    // The accumulator fills when the score stage actually executes; if the
    // stage was resumed from checkpoint it stays empty and the persisted
    // metrics table (written in the same run as the scores) is the record.
    val metrics: DataFrame = cfg.io match {
      case Some(io) if io.exists(spark, "metrics") && metricsAcc.value.isEmpty =>
        io.read(spark, "metrics")
      case other =>
        // force scores so the accumulator fills, then persist
        scores.count()
        val m = spark.createDataFrame(
          scala.jdk.CollectionConverters.ListHasAsScala(metricsAcc.value).asScala.toSeq)
        other.foreach(io => io.write(m, "metrics"))
        m
    }

    Result(trees, pairs, scores, matches, clusters, metrics)
  }

  /** Run-or-resume: with an IO configured, a stage whose table already
    * exists is read back instead of recomputed. */
  private def staged(spark: SparkSession, cfg: Config, table: String)(
      compute: => DataFrame): DataFrame =
    cfg.io match {
      case Some(io) =>
        if (!io.exists(spark, table)) io.write(compute, table)
        io.read(spark, table)
      case None => compute
    }

  /** Pairwise precision/recall/F1 of the thresholded scorer against the
    * ground-truth groupId labels, evaluated ON the candidate pairs (the
    * BASELINE metric: labeled pairs sharing a blocking key). */
  def pairwiseF1(scores: Dataset[ScoreRow], trees: Dataset[TreeRow]): DataFrame = {
    val spark = scores.sparkSession
    import spark.implicits._
    val labels = trees.toDF().select($"id", $"groupId")
    val labeled = scores.toDF()
      .join(labels.withColumnRenamed("id", "idA").withColumnRenamed("groupId", "gA"), "idA")
      .join(labels.withColumnRenamed("id", "idB").withColumnRenamed("groupId", "gB"), "idB")
      .withColumn("isDup", ($"gA" === $"gB") && ($"gA" >= 0))
    labeled.agg(
      sum(when($"isMatch" && $"isDup", 1L).otherwise(0L)).as("tp"),
      sum(when($"isMatch" && !$"isDup", 1L).otherwise(0L)).as("fp"),
      sum(when(!$"isMatch" && $"isDup", 1L).otherwise(0L)).as("fn"))
      .select(
        $"tp", $"fp", $"fn",
        ($"tp" / ($"tp" + $"fp")).as("precision"),
        ($"tp" / ($"tp" + $"fn")).as("recall"),
        (lit(2.0) * $"tp" / (lit(2.0) * $"tp" + $"fp" + $"fn")).as("f1"))
  }
}

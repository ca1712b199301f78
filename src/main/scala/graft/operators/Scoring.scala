package graft.operators

import graft.model.{PartMetrics, ScoreRow, TreeRow}
import graft.zs.Scorer
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.util.CollectionAccumulator

/** Stage 3: pairwise Zhang–Shasha scoring inside `mapPartitions`.
  *
  * The DP kernel is a black box to Catalyst by design (SURVEY.md §5):
  * keyroot decomposition must not be decomposed into relational ops. One
  * [[Scorer]] per partition reuses its scratch matrices across every
  * pair, so steady-state scoring allocates nothing but the output rows.
  *
  * Per-partition lineage goes through a CollectionAccumulator — one
  * [[PartMetrics]] row per task, registered via a task-completion
  * listener, collected on the driver after the action and persisted by
  * the Pipeline. #rows = #partitions, so the driver-side cost is
  * negligible even at cluster scale.
  */
object Scoring {

  /** Internal join-product row: a candidate pair with both flattened trees. */
  final case class PairTrees(
      idA: String, idB: String,
      laA: Array[Long], lmA: Array[Int], krA: Array[Int],
      laB: Array[Long], lmB: Array[Int], krB: Array[Int])

  /** Attach both trees to each candidate pair. Two equi-joins on id; the
    * trees side is one row per key, and salting is ADAPTIVE: per-id pair
    * degree is bounded by the blocking caps (~keysPerTree · blockCap, on
    * the order of 10³), so in the normal configuration no key is hot and
    * the wide tree rows ship exactly once — flat salting would multiply
    * the build side's shuffle volume by `salts` for no benefit. If a
    * config change (bigger caps, more bands) pushes some id's degree
    * past the threshold, just those ids are salted; AQE skew-split
    * remains on for residual shuffle skew.
    */
  def attachTrees(pairs: DataFrame, trees: Dataset[TreeRow], salts: Int = 8): Dataset[PairTrees] = {
    val spark = trees.sparkSession
    import spark.implicits._
    // ship hashed labels, not strings: primitive-array rows keep the
    // scoring stage free of string deserialization and shrink shuffle
    // and cache bytes (labels stay on TreeRow for the SQL surface)
    val slim = trees.toDF().select($"id", $"labelsH".as("labels"), $"lmds", $"keyroots")

    // hot sets for BOTH joins come from the narrow pairs table up front:
    // a pair row matches exactly one (id, salt) build row, so idB
    // multiplicity is unchanged by the first join — counting on the wide
    // join output would re-execute it just to rediscover these degrees
    val hotThreshold = 2048L
    val hotA = SaltedJoin.hotKeysOf(
      pairs.select(col("idA").as("id")), "id", hotThreshold)
    val hotB = SaltedJoin.hotKeysOf(
      pairs.select(col("idB").as("id")), "id", hotThreshold)

    val withA = SaltedJoin.adaptiveSaltedEquiJoin(
      pairs.withColumnRenamed("idA", "id"), slim, "id", salts,
      leftSaltBy = col("idB"), hotKeys = hotA)
      .withColumnRenamed("id", "idA")
      .withColumnRenamed("labels", "laA")
      .withColumnRenamed("lmds", "lmA")
      .withColumnRenamed("keyroots", "krA")
    val withB = SaltedJoin.adaptiveSaltedEquiJoin(
      withA.withColumnRenamed("idB", "id"), slim, "id", salts,
      leftSaltBy = col("idA"), hotKeys = hotB)
      .withColumnRenamed("id", "idB")
      .withColumnRenamed("labels", "laB")
      .withColumnRenamed("lmds", "lmB")
      .withColumnRenamed("keyroots", "krB")
    // Explicit repartition before the DP stage: AQE sizes the join
    // output by BYTES (~64MB targets), but scoring cost is CPU per pair
    // — a byte-coalesced layout would cap DP parallelism at a handful
    // of tasks. Hash on the pair id so heavy trees spread evenly.
    val par = spark.sparkContext.defaultParallelism *
      sys.env.getOrElse("GRAFT_SCORE_PAR_MULT", "6").toInt
    withB.select($"idA", $"idB", $"laA", $"lmA", $"krA", $"laB", $"lmB", $"krB")
      .repartition(par, $"idA", $"idB")
      .as[PairTrees]
  }

  /** Score all pairs; `tau` is the normalized-distance match threshold.
    * normDist = dist / (nA + nB), well-defined in [0,1] by the unit-cost
    * bound d ≤ |A| + |B|. */
  def score(
      pairTrees: Dataset[PairTrees],
      tau: Double,
      metricsAcc: Option[CollectionAccumulator[PartMetrics]] = None): Dataset[ScoreRow] = {
    val spark = pairTrees.sparkSession
    import spark.implicits._
    pairTrees.mapPartitions { it =>
      val scorer = new Scorer
      val t0 = System.nanoTime()
      var rowsIn = 0L
      metricsAcc.foreach { acc =>
        val tc = TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
          acc.add(PartMetrics(
            stage = "score",
            partitionId = if (tc == null) -1 else tc.partitionId(),
            rowsIn = rowsIn,
            rowsOut = rowsIn,
            pairsScored = scorer.pairsScored,
            dpCells = scorer.cellsTouched,
            wallNs = System.nanoTime() - t0))
        }
      }
      val emptyHash = graft.util.Hashing.hashString("")
      it.map { p =>
        rowsIn += 1
        val nA = p.laA.length
        val nB = p.laB.length
        // Threshold-banded DP: exact distance for matches (d ≤ τ·(nA+nB)),
        // capped at maxDist+1 beyond — cuts DP cells ~(n/2τ·n)× per pair.
        val maxDist = (tau * (nA + nB)).toInt
        val d = scorer.distHashedBounded(
          p.laA, p.lmA, p.krA, p.laB, p.lmB, p.krB, emptyHash, maxDist)
        val nd = d.toDouble / math.max(1, nA + nB)
        ScoreRow(p.idA, p.idB, d, nA, nB, nd, isMatch = nd <= tau)
      }
    }
  }

  /** Matched edges only, as (idA, idB). */
  def matches(scores: Dataset[ScoreRow]): DataFrame = {
    import scores.sparkSession.implicits._
    scores.toDF().where($"isMatch").select($"idA", $"idB")
  }
}

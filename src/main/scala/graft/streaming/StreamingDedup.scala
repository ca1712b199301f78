package graft.streaming

import graft.operators.{CandidateGen, Dedup}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental (streaming) corpus dedup: the foreachBatch twin of
  * [[graft.operators.Dedup.minHashPairs]], built on the same
  * capped-member bucketed state machine as [[StreamingEr]]. Each
  * micro-batch of new documents is MinHash-banded, merged into the
  * persistent `(key, members)` block index with ONE delta-sized
  * exchange ([[CandidateGen.mergeCappedMembers]] — the state side reads
  * pre-distributed from its bucketed table), and near-dup candidate
  * pairs touching a new member are emitted join-free
  * ([[CandidateGen.pairsWithNewMember]] — membership colocated in the
  * row). The cumulative pair set only ever grows: a near-dup, once
  * found, is never un-found, and when no block overflows the cap the
  * result equals batch [[Dedup.minHashPairs]] exactly (cap subset
  * monotonicity; StreamingDedupSpec asserts it).
  *
  * The whole path is NATURALLY idempotent under at-least-once replay:
  * re-merging a batch's members is a set union (no-op), and re-emitting
  * its pairs lands in a distinct-union — no replay guard needed, which
  * a spec locks by feeding the same batch twice.
  *
  * At 10^12-document scale the index is an Iceberg bucket-partitioned
  * table and each batch prunes to touched buckets; locally
  * [[graft.sources.BucketedState]] demonstrates the identical plan
  * shape, and survives process restarts via sidecar-validated DDL
  * re-registration.
  */
object StreamingDedup {

  final case class DedupState(
      index: DataFrame,   // (key, members sorted array) — capped block index
      pairs: DataFrame,   // (idA, idB) cumulative near-dup candidates
      batchesSeen: Int)

  /** One micro-batch against durable state under `bucketRoot`/`io` —
    * self-resuming like [[StreamingEr.processBatchBucketed]]: every call
    * finds the LATEST complete state generation and writes the next, so
    * a crash or restart between batches loses nothing. Generations older
    * than `retain` are garbage-collected after each successful write —
    * storage stays O(retain), not O(batches). `batchesSeen` counts
    * generations ever written (GC does not reset it). */
  def processBatchBucketed(
      spark: SparkSession,
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      io: graft.sources.TableIO,
      bucketRoot: String,
      numBuckets: Int,
      p: Dedup.MinHashParams = Dedup.MinHashParams(),
      prefix: String = "dstream",
      retain: Int = 2): DedupState = {
    import graft.sources.BucketedState
    require(retain >= 1, "must retain at least the latest generation")
    graft.Pipeline.tune(spark)

    val tag = java.lang.Long.toHexString(
      graft.util.Hashing.hashString(bucketRoot) & 0xffffffffL)
    def tbl(kind: String, b: Int) = s"${prefix}_${tag}_${kind}_b$b"
    def path(kind: String, b: Int) = s"$bucketRoot/${prefix}_${kind}_b$b"
    def idxExists(b: Int): Boolean =
      BucketedState.isComplete(spark, path("index", b))

    val gens = StateGenerations.list(spark, bucketRoot, s"${prefix}_index_b")
    val prev = StateGenerations.latestComplete(gens,
      b => idxExists(b) && io.exists(spark, tbl("pairs", b)))
    val k = prev.map(_ + 1).getOrElse(0)
    val prevIdx = prev.map(b => BucketedState.readOrRegister(
      spark, tbl("index", b), path("index", b), numBuckets, "key"))
    val prevPairs = prev.map(b => io.read(spark, tbl("pairs", b)))

    val merged = CandidateGen
      .mergeCappedMembers(prevIdx, Dedup.minHashKeyed(newDocs, idCol, textCol, p), p.cap)
      .persist()
    val newPairs = CandidateGen.pairsWithNewMember(merged)
    val allPairs = prevPairs.map(_.unionByName(newPairs)).getOrElse(newPairs).distinct()

    BucketedState.write(merged.select(col("key"), col("members")),
      tbl("index", k), path("index", k), numBuckets, "key")
    io.write(allPairs, tbl("pairs", k))
    merged.unpersist()

    // GC: generation k is complete, so anything ≤ k − retain can go
    // (k − 1 stays as the crash-safety fallback at the default retain)
    StateGenerations.prune(gens, k - retain) { g =>
      // keyed artifact (the index dir the generation listing is built
      // from) goes LAST — deleting it first and crashing would orphan
      // the pairs table beyond any later prune's reach
      io.delete(spark, tbl("pairs", g))
      BucketedState.drop(spark, tbl("index", g), path("index", g))
    }

    DedupState(
      index = BucketedState.read(spark, tbl("index", k)),
      pairs = io.read(spark, tbl("pairs", k)),
      batchesSeen = k + 1)
  }

  /** foreachBatch wiring: stop/restart/crash-safe — every micro-batch
    * resumes from the latest complete state generation in storage. */
  def startCheckpointedBucketed[T](
      spark: SparkSession,
      stream: Dataset[T],
      idCol: String,
      textCol: String,
      io: graft.sources.TableIO,
      bucketRoot: String,
      numBuckets: Int,
      p: Dedup.MinHashParams = Dedup.MinHashParams())(
      onBatch: DedupState => Unit): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[T], _: Long) =>
        onBatch(processBatchBucketed(
          spark, batch.toDF(), idCol, textCol, io, bucketRoot, numBuckets, p))
      }
      .start()
}

package graft.operators

import graft.util.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and a random-
  * hyperplane LSH-bucketed variant as the scale path. Distance math is
  * pure `zip_with`/`aggregate` — codegen'd, no UDFs.
  */
object Similarity {

  /** Per-bucket candidate caps — single definitions shared with the
    * DuckDB oracle SQL (SimQueries interpolates them), so query and
    * oracle cannot desync. */
  val LshKnnCap: Int = 256
  val EmbedNearDupCap: Int = 128
  val SemDedupCap: Int = 64


  /** Cosine similarity of two float-array columns, in double precision,
    * deterministic left-to-right fold. */
  def cosineCol(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val na = sqrt(dot(a, a))
    val nb = sqrt(dot(b, b))
    dot(a, b) / greatest(na * nb, lit(1e-12))
  }

  /** Exact top-k cosine neighbors for each query vector.
    *
    * Scale shape: queries are the SMALL side — broadcast them so the
    * corpus streams through map tasks with no shuffle of the big side;
    * the only shuffle is the final per-query top-k (window on
    * #queries·k rows). At 100 TB the corpus scan dominates and
    * parallelizes linearly; never collect the corpus. */
  def bruteKnn(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(queries.select(
        col("vec_id").as("query_id"), col("embedding").as("q_emb"))))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosineCol(col("embedding"), col("q_emb")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    scored
      .select(col("query_id"), col("vec_id"), col("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Deterministic random hyperplanes: `tables` sets of `planeBits`
    * pseudo-random unit-direction vectors, seeded — identical on every
    * executor. */
  private[operators] def planes(dim: Int, planeBits: Int, tables: Int): Array[Array[Array[Float]]] = {
    Array.tabulate(tables, planeBits) { (t, p) =>
      val rng = new Hashing.DetRng(Hashing.hashLong(t.toLong * 131L + p, 0x9e3779b9L))
      Array.fill(dim)((rng.nextDouble() * 2.0 - 1.0).toFloat)
    }
  }

  /** Sign-LSH bucket signature of a vector for one table. */
  private def sigFor(v: Seq[Float], tablePlanes: Array[Array[Float]]): Long = {
    var sig = 0L
    var p = 0
    while (p < tablePlanes.length) {
      val plane = tablePlanes(p)
      var s = 0.0
      var i = 0
      val n = math.min(v.length, plane.length)
      while (i < n) { s += v(i) * plane(i); i += 1 }
      if (s > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Approximate top-k: bucket vectors by random-hyperplane signature in
    * `tables` tables, score only same-bucket candidates. Recall rises
    * with `tables`, cost with bucket size — corpus-side membership of
    * each bucket is capped at `cap` (keep the `cap` smallest ids,
    * deterministic) BEFORE the join, so one hot bucket can never emit
    * more than #queries·cap candidates. */
  /** `(bucket, id)` sign-LSH bucket table — one row per (table, vector).
    * Buckets depend only on (dim, planeBits, tables) and the fixed
    * seeds, so corpus and query sides bucketed separately still land in
    * the same space. Public so Verify can dump the stage tables for the
    * DuckDB oracle, which redoes the cap + join + cosine + rank. */
  def lshBuckets(df: DataFrame, planeBits: Int, tables: Int,
                 dimHint: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val dim = dimHint.getOrElse(
      df.select(col("embedding")).head().getSeq[Float](0).length)
    val ps = planes(dim, planeBits, tables)
    val bps = spark.sparkContext.broadcast(ps)
    df.select(col("vec_id").cast("long"), col("embedding")).as[(Long, Seq[Float])]
      .flatMap { case (id, emb) =>
        val local = bps.value
        (0 until local.length).iterator.map { t =>
          (Hashing.mix64(Hashing.hashLong(t.toLong, 991L) ^ sigFor(emb, local(t))), id)
        }
      }
      .toDF("bucket", "id")
  }

  def lshKnn(corpus: DataFrame, queries: DataFrame, k: Int,
             planeBits: Int = 12, tables: Int = 8,
             cap: Int = Similarity.LshKnnCap,
             dimHint: Option[Int] = None): DataFrame = {
    val qb = lshBuckets(queries, planeBits, tables, dimHint)
      .withColumnRenamed("id", "query_id")
    // cap through CandidateGen's one definition (keep lowest ids)
    val cb = CandidateGen.capByKey(
        lshBuckets(corpus, planeBits, tables, dimHint)
          .withColumnRenamed("bucket", "key"), cap)
      .withColumnRenamed("key", "bucket")
    val cand = qb.join(cb, "bucket")
      .where(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id"))
      .distinct()

    val scored = cand
      .join(queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb")), "query_id")
      .join(corpus.select(col("vec_id").as("id"), col("embedding")), "id")
      .withColumn("cosine", cosineCol(col("embedding"), col("q_emb")))
      .select(col("query_id"), col("id").as("vec_id"), col("cosine"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  // ---- IVF (inverted-file) ANN -----------------------------------------

  /** Deterministic Lloyd k-means over a bounded driver-side sample —
    * the coarse quantizer of an IVF index. Training on a fixed-size
    * sample is the standard IVF recipe (the index quality depends on
    * centroid coverage, not on seeing every vector); the ONLY
    * driver-side data is the sample (≤ `sampleCap` rows), never the
    * corpus. Seeded: identical centroids on every run/executor. */
  private[graft] def trainCentroids(
      corpus: DataFrame, nlist: Int, iters: Int = 8, sampleCap: Int = 2048): Array[Array[Float]] = {
    import corpus.sparkSession.implicits._
    val total = corpus.count()
    val step = math.max(1L, total / sampleCap)
    // sample on a hash of the id, not the id itself: strided/sparse id
    // spaces would skew a modulo-of-id sample (or select nothing); the
    // hash is uniform regardless of id density. Hard-cap after the
    // deterministic sort so the driver-side bound holds exactly.
    val sample0 = corpus.select(col("vec_id").cast("long"), col("embedding"))
      .where(pmod(xxhash64(col("vec_id")), lit(step)) === 0)
      .as[(Long, Seq[Float])].collect().sortBy(_._1).take(sampleCap).map(_._2.toArray)
    // hash sampling selecting zero rows from a tiny corpus is possible in
    // principle — fall back to the first `sampleCap` ids
    val sample =
      if (sample0.nonEmpty) sample0
      else corpus.select(col("vec_id").cast("long"), col("embedding"))
        .orderBy(col("vec_id")).limit(sampleCap)
        .as[(Long, Seq[Float])].collect().sortBy(_._1).map(_._2.toArray)
    require(sample.nonEmpty, "empty corpus")
    val dim = sample.head.length
    val k = math.min(nlist, sample.length)
    // seeded init: spread starts across the sample
    val cents = Array.tabulate(k)(c => sample((c.toLong * sample.length / k).toInt).clone())
    val assign = new Array[Int](sample.length)
    var it = 0
    while (it < iters) {
      var s = 0
      while (s < sample.length) {
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          val cv = cents(c); val sv = sample(s)
          while (i < dim) { val t = sv(i) - cv(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        assign(s) = best
        s += 1
      }
      val sums = Array.ofDim[Double](k, dim)
      val counts = new Array[Int](k)
      s = 0
      while (s < sample.length) {
        val a = assign(s); counts(a) += 1
        var i = 0
        while (i < dim) { sums(a)(i) += sample(s)(i); i += 1 }
        s += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var i = 0
          while (i < dim) { cents(c)(i) = (sums(c)(i) / counts(c)).toFloat; i += 1 }
        } // empty list keeps its previous centroid (deterministic)
        c += 1
      }
      it += 1
    }
    cents
  }

  private def nearestLists(v: Seq[Float], cents: Array[Array[Float]], nprobe: Int): Array[Int] = {
    val ds = Array.tabulate(cents.length) { c =>
      var d = 0.0; var i = 0
      val cv = cents(c)
      val n = math.min(v.length, cv.length)
      while (i < n) { val t = v(i) - cv(i); d += t * t; i += 1 }
      (d, c)
    }
    ds.sortBy(x => (x._1, x._2)).take(nprobe).map(_._2)
  }

  /** IVF approximate top-k: corpus vectors are assigned to their nearest
    * of `nlist` centroids (one narrow map — this IS the inverted file);
    * each query probes its `nprobe` nearest lists and scores only those
    * lists' members. Scale shape: the assignment is a pure map over the
    * corpus (no shuffle), the join is an equi-join on list id with the
    * tiny query side broadcast, and recall/cost trade via nprobe. The
    * centroid table is trained once on a bounded sample and broadcast —
    * at 100 TB the inverted file would be a bucketed/partitioned table
    * so probes prune to nprobe partitions per query. */
  /** The inverted-file assignment tables: `(list, vec_id)` for the
    * corpus (each vector in its nearest list — this IS the inverted
    * file) and `(list, query_id)` for the queries (each probing its
    * `nprobe` nearest lists). Public so Verify can dump them for the
    * DuckDB oracle, which redoes the probe join + cosine + rank.
    * Deterministic: the quantizer is seeded, so separate calls with the
    * same inputs yield identical assignments. */
  def ivfAssignments(corpus: DataFrame, queries: DataFrame,
                     nlist: Int, nprobe: Int,
                     centsHint: Option[Array[Array[Float]]] = None)
      : (DataFrame, DataFrame) = {
    // centsHint: a caller that runs several IVF variants over the same
    // corpus (nprobe sweeps, the semantic-dedup clustering) trains the
    // deterministic quantizer once and passes it in — identical output,
    // one count+collect+Lloyd pass instead of one per variant
    val cents = centsHint.getOrElse(trainCentroids(corpus, nlist))
    (assignLists(corpus, cents, 1, "vec_id"),
      assignLists(queries, cents, nprobe, "query_id"))
  }

  /** `(list, idOut)` rows assigning each vector to its `nprobe` nearest
    * centroids — the shared narrow-map half of the IVF index and the
    * semantic-dedup clustering (the centroid table is broadcast). */
  private def assignLists(df: DataFrame, cents: Array[Array[Float]],
                          nprobe: Int, idOut: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)
    df.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .flatMap { case (id, emb) =>
        nearestLists(emb, bc.value, nprobe).iterator.map(l => (l, id))
      }
      .toDF("list", idOut)
  }

  def ivfKnn(corpus: DataFrame, queries: DataFrame, k: Int,
             nlist: Int = 32, nprobe: Int = 4,
             centsHint: Option[Array[Array[Float]]] = None): DataFrame = {
    val (corpusLists, queryLists) =
      ivfAssignments(corpus, queries, nlist, nprobe, centsHint)
    val cand = broadcast(queryLists).join(corpusLists, "list")
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
    val scored = cand
      .join(queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb")), "query_id")
      .join(corpus.select(col("vec_id"), col("embedding")), "vec_id")
      .withColumn("cosine", cosineCol(col("embedding"), col("q_emb")))
      .select(col("query_id"), col("vec_id"), col("cosine"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  // ---- Semantic dedup (k-means clusters + within-cluster cosine) -------

  /** Each corpus vector's nearest-centroid assignment `(list, vec_id)` —
    * the coarse k-means clustering reused from the IVF quantizer (same
    * seeded bounded-sample training, one narrow map over the corpus, no
    * shuffle). Public so Verify can dump it for the DuckDB oracle. */
  def kmeansAssign(corpus: DataFrame, nlist: Int,
                   centsHint: Option[Array[Array[Float]]] = None): DataFrame =
    assignLists(corpus, centsHint.getOrElse(trainCentroids(corpus, nlist)),
      1, "vec_id")

  /** Semantic dedup pairs — the SemDeDup recipe (Abbas et al. 2023,
    * arXiv:2303.09540): cluster embeddings with k-means, then compare
    * cosines only WITHIN a cluster; cross-cluster pairs are never
    * materialized. Complements [[embeddingNearDupPairs]] (sign-LSH
    * buckets): k-means clusters follow the data's density rather than
    * fixed random hyperplanes, so near-dups concentrate into the same
    * list with far fewer tables. Scale shape: the assignment is a
    * narrow map (the centroid table is broadcast), and the
    * within-cluster pair generation funnels through the same capped
    * `CandidateGen.pairsFromKeys` single-exchange plan as every other
    * candidate generator — a mega-cluster costs at most cap·(cap−1)/2
    * pairs, never n². Threshold compares the 6dp-rounded cosine, same
    * cross-engine-stable predicate as the LSH path. */
  def semDedupPairs(corpus: DataFrame, nlist: Int, minCosine: Double,
                    cap: Int = Similarity.SemDedupCap,
                    centsHint: Option[Array[Array[Float]]] = None): DataFrame = {
    val keyed = kmeansAssign(corpus, nlist, centsHint)
      .select(col("list").as("key"), col("vec_id").as("id"))
    scorePairs(CandidateGen.pairsFromKeys(keyed, cap), corpus, minCosine)
  }

  /** Shared verification tail of the embedding dedup modes: fetch both
    * sides' vectors, score the cosine, keep pairs at or above the
    * 6dp-rounded threshold (the cross-engine-stable predicate). */
  private def scorePairs(cand: DataFrame, corpus: DataFrame, minCosine: Double): DataFrame =
    cand
      .join(corpus.select(col("vec_id").as("idA"), col("embedding").as("embA")), "idA")
      .join(corpus.select(col("vec_id").as("idB"), col("embedding").as("embB")), "idB")
      .withColumn("cosine", cosineCol(col("embA"), col("embB")))
      .where(round(col("cosine"), 6) >= minCosine)
      .select(col("idA"), col("idB"), col("cosine"))

  /** Embedding-cosine near-duplicate pairs (cosine ≥ minCosine) via the
    * same LSH bucketing — the "embedding near-dup" dedup mode. The
    * threshold compares the cosine ROUNDED to 6 decimals: semantically a
    * no-op for a dedup threshold, and it makes the predicate
    * reproducible across engines (cross-engine double folds agree to
    * well beyond 1e-6 but not to the last ulp — an unrounded compare at
    * the exact boundary could flip between the engine and a verifier). */
  def embeddingNearDupPairs(corpus: DataFrame, minCosine: Double,
                            planeBits: Int = 12, tables: Int = 8,
                            cap: Int = Similarity.EmbedNearDupCap,
                            dimHint: Option[Int] = None): DataFrame = {
    val keyed = lshBuckets(corpus, planeBits, tables, dimHint)
      .withColumnRenamed("bucket", "key")
    scorePairs(CandidateGen.pairsFromKeys(keyed, cap), corpus, minCosine)
  }
}

package graft

import graft.operators.{Multimodal, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search and multimodal queries over `embeddings.parquet` /
  * `documents.parquet`. Brute-force kNN and full-probe IVF are
  * DuckDB-oracle-checked (outputs rounded to 6dp so cross-engine float
  * sums compare exactly; ranking runs on full precision in both
  * engines); the seeded-hash LSH/IVF-pruned variants are rows-only with
  * ScalaTest recall ladders against brute force instead.
  */
object SimQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  private def queriesOf(df: DataFrame, n: Int): DataFrame =
    df.where(col("vec_id") < n)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact brute-force cosine top-5 for the first 20 vectors; cosine is
    // rounded to 6dp in the OUTPUT only (ranking runs on full precision)
    // so the DuckDB oracle's independently computed cosines compare
    // exactly — cross-engine float sums agree far beyond 1e-6
    "q_knn_brute" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.bruteKnn(e, queriesOf(e, 20), k = 5)
        .select(col("query_id"), col("vec_id"),
          round(col("cosine"), 6).as("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // LSH-bucketed approximate top-5 for the same queries; few plane
    // bits because these embeddings are weakly correlated (top-1 cosine
    // ~0.4 ⇒ P(bit agree) ~0.62) — more bits would empty the buckets
    "q_knn_lsh" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.lshKnn(e, queriesOf(e, 20), k = 5, planeBits = 4, tables = 8)
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF-indexed approximate top-5 (k-means coarse quantizer over a
    // bounded sample, nprobe-list probing) — the second ANN scale path
    "q_knn_ivf" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.ivfKnn(e, queriesOf(e, 20), k = 5, nlist = 16, nprobe = 4)
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF with nprobe = nlist probes every inverted list, which must
    // reproduce brute force EXACTLY — the driver oracle checks it
    // against its own independent kNN recompute
    "q_knn_ivf_full" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.ivfKnn(e, queriesOf(e, 20), k = 5, nlist = 16, nprobe = 16)
        .select(col("query_id"), col("vec_id"),
          round(col("cosine"), 6).as("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // embedding-cosine near-dup pairs; threshold calibrated to the
    // synthetic embeddings (top-1 neighbor cosine is ~0.32-0.48, so
    // 0.35 marks the "unusually close" tail — real corpora would use
    // ~0.9 on normalized text embeddings)
    "q_embed_neardup" -> ((s, dir) => {
      Similarity.embeddingNearDupPairs(emb(s, dir), minCosine = 0.35)
        .orderBy(col("idA"), col("idB"))
    }),

    // multimodal: binary assets + stub-decoded features
    "q_multimodal_features" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      Multimodal.extractFeatures(Multimodal.assets(docs)).toDF()
        .select(col("asset_id"), col("mime"), col("width"), col("height"), col("n_frames"))
        .orderBy(col("asset_id"))
    }),

    // multimodal: frame sampling plumbing for video assets
    "q_frame_samples" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val feats = Multimodal.extractFeatures(Multimodal.assets(docs))
      Multimodal.sampleFrames(feats, stride = 10)
        .orderBy(col("asset_id"), col("frame_idx"))
    })
  )

  /** DuckDB oracles: brute-force kNN is fully recomputed by the oracle
    * engine (its own cross join + cosine + window rank); frame sampling
    * is recomputed from the dumped features table ({OUT} = dump dir,
    * substituted by Verify). LSH variants stay rows-only: their buckets
    * are seeded engine-internal hashes. */
  private val bruteKnnSql =
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
        |  FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id, embedding::DOUBLE[] AS ce FROM embeddings),
        |scored AS (
        |  SELECT q.query_id, c.vec_id,
        |    list_cosine_similarity(c.ce, q.qe) AS cosine
        |  FROM c CROSS JOIN q WHERE c.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, vec_id, cosine,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rnk
        |  FROM scored)
        |SELECT query_id, vec_id, round(cosine, 6) AS cosine, CAST(rnk AS INT) AS "rank"
        |FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_knn_brute" -> bruteKnnSql,
    // full-probe IVF must equal brute force exactly
    "q_knn_ivf_full" -> bruteKnnSql,
    "q_frame_samples" ->
      """SELECT asset_id, frame_idx FROM (
        |  SELECT asset_id, CAST(unnest(range(0, n_frames, 10)) AS INT) AS frame_idx
        |  FROM read_parquet('{OUT}/q_multimodal_features/*.parquet')
        |  WHERE mime LIKE 'video%')
        |ORDER BY asset_id, frame_idx""".stripMargin)
}

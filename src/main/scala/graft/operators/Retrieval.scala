package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval over a document corpus — the lexical ranking
  * half of corpus curation (finding topic-relevant training documents;
  * the embedding kNN in [[Similarity]] is the semantic half).
  *
  * Okapi BM25: score(d, q) = Σ_{t ∈ q} idf(t) · tf(t,d)·(k1+1) /
  * (tf(t,d) + k1·(1 − b + b·|d|/avgdl)), idf(t) = ln((N − df(t) + 0.5)
  * / (df(t) + 0.5) + 1) (Robertson/Spärck Jones; the +1 keeps idf
  * positive as in Lucene).
  *
  * Scale shape: tokenization + term filter run map-side on the corpus
  * scan (only QUERY terms survive the explode — the posting table is
  * |q|·#matching-docs rows, not the full inverted index); df and the
  * corpus stats (N, avgdl) are O(|q|)- and O(1)-row aggregates that
  * BROADCAST back; the per-doc score is one partial-aggregated groupBy.
  * Nothing driver-side. Every step is deterministic relational algebra
  * (same `[a-z0-9]+` tokenizer as TextAnalysis), so the DuckDB oracle
  * replays the entire computation, ln() included.
  */
object Retrieval {

  val K1 = 1.2d
  val B = 0.75d

  private def tokens = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))

  /** Top-k docs for `terms` by BM25. Output (rank, doc_id, score) with
    * score rounded to 6dp and rank broken deterministically by doc_id
    * on the ROUNDED score (cross-engine stable ordering). */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val withLen = docs.select(col("doc_id"), tokens.as("toks"))
      .withColumn("dl", size(col("toks")))
    // posting list restricted to query terms at the scan
    val tf = withLen
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val stats = withLen.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))

    val contrib = tf
      .join(broadcast(df_), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5d) / (col("df") + 0.5d) + 1.0d))
      .withColumn("c",
        col("idf") * (col("tf") * (K1 + 1.0d)) /
          (col("tf") + lit(K1) * (lit(1.0d - B) + lit(B) * col("dl") / col("avgdl"))))
    contrib.groupBy(col("doc_id"))
      .agg(round(sum(col("c")), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id"))))
      .select(col("rank"), col("doc_id"), col("score"))
  }

  /** The DuckDB-side replay of [[bm25TopK]] — generated from the same
    * constants/terms so the engines cannot drift. */
  def bm25Sql(terms: Seq[String], k: Int): String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH dl AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
       |  FROM documents),
       |wl AS (SELECT doc_id, len(toks) AS dl FROM dl),
       |tok AS (SELECT doc_id, unnest(toks) AS term FROM dl),
       |tf AS (
       |  SELECT t.doc_id, w.dl, t.term, count(*) AS tf
       |  FROM tok t JOIN wl w ON w.doc_id = t.doc_id
       |  WHERE t.term IN ($termList)
       |  GROUP BY t.doc_id, w.dl, t.term),
       |stats AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
       |         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM wl),
       |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
       |c AS (
       |  SELECT tf.doc_id,
       |    ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
       |      * (tf.tf * ${K1 + 1.0}) /
       |      (tf.tf + $K1 * (1.0 - $B + $B * tf.dl / s.avgdl)) AS c
       |  FROM tf JOIN df USING (term) CROSS JOIN stats s),
       |sc AS (
       |  SELECT doc_id, round(sum(c), 6) AS score FROM c GROUP BY doc_id
       |  ORDER BY score DESC, doc_id LIMIT $k)
       |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank,
       |  doc_id, score
       |FROM sc ORDER BY rank""".stripMargin
  }
}

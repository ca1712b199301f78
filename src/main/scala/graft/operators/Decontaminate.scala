package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag corpus documents that share any
  * n-token shingle with a (small) evaluation/benchmark set, the
  * standard train/test-overlap scrub a training-data pipeline runs
  * before anything else touches the corpus.
  *
  * Scale shape (the whole point): the benchmark side is tiny by
  * definition (eval sets are thousands of docs, the corpus is
  * billions), so its distinct gram set BROADCASTS. The corpus's
  * exploded grams then hit a broadcast inner join map-side — they are
  * never shuffled — and only the matching rows (rare) reach the
  * per-doc aggregation. At 100 TB the wide data crosses zero
  * exchanges; the only shuffled rows are actual contamination hits.
  * Shingling itself is codegen'd array ops (transform + slice), no
  * UDF, no token-grain rows outside the one explode that feeds the
  * broadcast probe.
  */
object Decontaminate {

  val DefaultN = 8

  /** One (doc_id, gram) row per position: whitespace-joined n-token
    * shingles over [[TextAnalysis.tokensCol]]'s token stream. Docs
    * shorter than n tokens contribute nothing. */
  def grams(docs: DataFrame, idCol: String, textCol: String,
            n: Int = DefaultN): DataFrame = {
    val toks = TextAnalysis.tokensCol(col(textCol))
    docs.select(col(idCol).as("doc_id"),
      explode(when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
        .otherwise(array().cast("array<string>"))).as("gram"))
  }

  /** Per-corpus-doc contamination verdict against `benchmark`:
    * (doc_id, n_hits = distinct shared grams, contaminated). Every
    * corpus doc gets a row (clean docs carry n_hits = 0). */
  def flag(corpus: DataFrame, benchmark: DataFrame, idCol: String = "doc_id",
           textCol: String = "text", n: Int = DefaultN): DataFrame = {
    val bench = grams(benchmark, idCol, textCol, n).select(col("gram")).distinct()
    val hits = grams(corpus, idCol, textCol, n)
      .join(broadcast(bench), Seq("gram"))
      .groupBy(col("doc_id")).agg(countDistinct(col("gram")).as("n_hits"))
    corpus.select(col(idCol).as("doc_id"))
      .join(broadcast(hits), Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0)
  }
}

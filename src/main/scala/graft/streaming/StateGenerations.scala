package graft.streaming

import org.apache.spark.sql.SparkSession

/** Generation bookkeeping for durable streaming state: each micro-batch
  * writes generation `b` (a new set of bucketed dirs + TableIO tables),
  * resume picks the LATEST complete generation, and old generations are
  * garbage-collected so storage stays O(retain), not O(batches) — the
  * difference between a stream that runs for a week and one that runs
  * for years at 10^12-row scale.
  */
private[streaming] object StateGenerations {

  /** Generation numbers present under `rootDir` as `<dirPrefix><b>`
    * directories, ascending. Missing root → empty (fresh stream). */
  def list(spark: SparkSession, rootDir: String, dirPrefix: String): Seq[Int] = {
    val root = new org.apache.hadoop.fs.Path(rootDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fromNames(fs.listStatus(root).toSeq.map(_.getPath.getName), dirPrefix)
  }

  /** Generation numbers parsed from TABLE names (TableIO.listTables
    * output) with the given prefix, ascending — the catalog-portable
    * twin of [[list]]: a raw-FS listing over some rootDir cannot see a
    * catalog-backed TableIO's tables, and a caller-supplied rootDir
    * that drifts from the TableIO's own root would silently resume from
    * empty. Listing through the SAME io the state is written with
    * removes both failure modes. */
  def fromNames(names: Seq[String], prefix: String): Seq[Int] =
    names.filter(_.startsWith(prefix))
      .flatMap(n => scala.util.Try(n.stripPrefix(prefix).toInt).toOption)
      .sorted

  /** Latest generation for which `complete` holds (a crash can leave a
    * half-written newer generation — it is simply overwritten). */
  def latestComplete(gens: Seq[Int], complete: Int => Boolean): Option[Int] =
    gens.reverse.find(complete)

  /** Delete every complete-or-partial generation ≤ `upTo`. */
  def prune(gens: Seq[Int], upTo: Int)(deleteGen: Int => Unit): Unit =
    gens.filter(_ <= upTo).foreach(deleteGen)
}

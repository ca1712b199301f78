package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed persistent state: the co-located-join storage layout for
  * state that is repeatedly joined on the same key across runs or
  * micro-batches (the streaming block index `(key, id)`, the IVF
  * inverted file `(list, vec_id)`, tree rows keyed by id).
  *
  * A plain parquet table re-shuffles on every join; a table written
  * with `bucketBy(n, key)` carries its hash-partitioning in the
  * catalog, so joins and aggregations on the bucket column read it
  * ALREADY distributed — zero exchange on the state side
  * (BucketedStateSpec locks the shuffle-free plans). At deployment
  * scale the same layout is an Iceberg bucket-partitioned table and
  * the incremental new-vs-bucket join additionally prunes to the
  * buckets touched by the batch; locally the catalog is
  * session-scoped, which demonstrates the identical plan shape.
  * Complements [[TableIO]] (resume atomicity) — this is the layout
  * axis, that is the lifecycle axis.
  */
object BucketedState {

  /** Name of the bucket-spec sidecar [[write]] leaves next to the data
    * — the one piece of metadata a metastore would otherwise hold, so a
    * post-restart [[register]] can VERIFY the caller's layout params
    * against what the files were actually written with. */
  private val SpecFile = "_graft_bucket_spec"

  /** Write `df` as a bucketed external table at `path`. The bucket
    * column should be the (single) join/aggregation key; `numBuckets`
    * sets the fixed parallelism of future shuffle-free reads, so size
    * it like a shuffle-partition count for the table's full-scale
    * volume, not the current one. */
  def write(df: DataFrame, table: String, path: String,
            numBuckets: Int, bucketCol: String): Unit = {
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(path, SpecFile), true)
    try out.write(s"$numBuckets $bucketCol".getBytes("UTF-8")) finally out.close()
  }

  private def readSpec(spark: SparkSession, path: String): Option[(Int, String)] = {
    val p = new org.apache.hadoop.fs.Path(path, SpecFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      val Array(n, c) = txt.trim.split(" ", 2)
      Some((n.toInt, c))
    }
  }

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  def exists(spark: SparkSession, table: String): Boolean =
    spark.catalog.tableExists(table)

  /** Re-register an existing bucketed-file directory after the catalog
    * that carried its layout is gone (process restart — the in-memory
    * catalog is session-scoped). Spark's bucketed writer encodes the
    * bucket id in each file name, so a `CREATE TABLE … CLUSTERED BY …
    * INTO n BUCKETS LOCATION path` over the same directory restores the
    * FULL layout: zero-exchange joins/aggregations on the bucket column
    * and single-bucket pruning on equality probes (BucketedStateSpec
    * locks both). This is the no-metastore restart story; with Iceberg
    * the table metadata itself is durable and this call disappears.
    *
    * `numBuckets` and `bucketCol` must match the original write — they
    * are part of the on-disk contract, exactly as a metastore would
    * persist them, and they are VALIDATED here against the sidecar spec
    * [[write]] leaves with the data (declaring a wrong layout would make
    * Spark silently skip rows on pruned/zero-exchange reads — a loud
    * failure is mandatory). The schema is recovered from the parquet
    * footers. */
  def register(spark: SparkSession, table: String, path: String,
               numBuckets: Int, bucketCol: String): Unit = {
    readSpec(spark, path) match {
      case Some((n, c)) =>
        require(n == numBuckets && c == bucketCol,
          s"bucket layout mismatch for $path: files were written with " +
            s"($n, $c) but register was called with ($numBuckets, $bucketCol)")
      case None =>
        throw new IllegalStateException(
          s"no bucket spec sidecar at $path — refusing to re-register a " +
            "layout that cannot be verified (was this directory written by " +
            "BucketedState.write?)")
    }
    val ddlSchema = spark.read.parquet(path).schema.toDDL
    spark.sql(
      s"""CREATE TABLE $table ($ddlSchema)
         |USING parquet CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol)
         |INTO $numBuckets BUCKETS LOCATION '$path'""".stripMargin)
    ()
  }

  /** [[read]], restoring the catalog entry first if a restart lost it. */
  def readOrRegister(spark: SparkSession, table: String, path: String,
                     numBuckets: Int, bucketCol: String): DataFrame = {
    if (!exists(spark, table)) register(spark, table, path, numBuckets, bucketCol)
    read(spark, table)
  }

  /** `_SUCCESS`-gated completeness probe for a bucketed-table directory
    * — the visibility rule streaming resume scans share. */
  def isComplete(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Full teardown of one bucketed table: catalog entry (if any) plus
    * the directory (data, `_SUCCESS`, sidecar spec). The ONE definition
    * of the teardown contract — streaming generation GC in both the ER
    * and dedup paths calls this; with Iceberg it becomes DROP TABLE /
    * expire-snapshots. Safe on a missing table/dir. */
  def drop(spark: SparkSession, table: String, path: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    ()
  }
}

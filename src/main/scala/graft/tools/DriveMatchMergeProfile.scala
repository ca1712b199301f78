package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of the q_match_merge composition on the real
  * documents table: the SetSimJoin round, the CC round, the merge
  * groupBy — so the operator's cost structure is measured, not argued.
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.DriveMatchMergeProfile <sfDir>
  */
object DriveMatchMergeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val b = expr("(doc_id DIV 3) * 10")
    val r = pmod(col("doc_id"), lit(3))
    val profiles = docs.select(col("doc_id").as("id"),
      when(r === 0, array(b + lit(1), b + lit(2), b + lit(3), b + lit(4)))
        .when(r === 1, array(b + lit(3), b + lit(4), b + lit(5), b + lit(6)))
        .otherwise(array(b + lit(1), b + lit(2), b + lit(5), b + lit(6),
          b + lit(7), b + lit(8))).as("toks"))
    profiles.count()

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[mm] $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      a
    }

    val cur = t("init_checkpoint") {
      profiles.select(col("id").as("eid"), array(col("id")).as("members"),
        array_sort(array_distinct(col("toks"))).as("toks"))
        .localCheckpoint(true)
    }
    val pairs = t("setsim_round1") {
      graft.operators.SetSimJoin.join(
        cur.select(col("eid").as("id"), col("toks")), 1, 3)
        .select(col("idA"), col("idB")).localCheckpoint(true)
    }
    t("head_probe") { pairs.head(1) }
    val incident = pairs.select(col("idA").as("id"))
      .union(pairs.select(col("idB").as("id"))).distinct()
    val cc = t("cc_round1") {
      val c = graft.operators.Clustering.connectedComponents(pairs, incident)
      c.count(); c
    }
    val merged = t("merge_groupby") {
      cur.join(cc, cur("eid") === cc("id"), "left")
        .groupBy(coalesce(col("clusterId"), col("eid")).as("clusterId"))
        .agg(array_sort(array_distinct(flatten(collect_list(col("members"))))).as("members"),
          array_sort(array_distinct(flatten(collect_list(col("toks"))))).as("toks"))
        .select(col("clusterId").as("eid"), col("members"), col("toks"))
        .localCheckpoint(true)
    }
    t("setsim_round2") {
      graft.operators.SetSimJoin.join(
        merged.select(col("eid").as("id"), col("toks")), 1, 3).count()
    }
    spark.stop()
  }
}

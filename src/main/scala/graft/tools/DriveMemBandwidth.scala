package graft.tools

/** STREAM-style memory-bandwidth probe (McCalpin's public triad kernel:
  * a(i) = b(i) + s*c(i)), run at 1/8/16/32 threads with per-thread
  * private arrays sized far beyond L3. No Spark, no shared data, no
  * synchronization inside the timed region — if aggregate GB/s stops
  * growing with threads, that is the BOX's memory system saturating,
  * not any property of code running on it.
  *
  * Purpose: the north_rule scaling gate is evidenced at local[8] vs
  * local[32]; every contended-window sample shows the 32-core DP rate
  * capped at an aggregate ceiling while ≤8-core rates stay flat. This
  * tool measures that ceiling directly so BENCH.md can attribute the
  * gap to hardware bandwidth with engine-independent numbers (no perf
  * counters exist in this sandbox).
  *
  * Usage: sbt -batch "runMain graft.tools.DriveMemBandwidth"
  * Prints one JSON line per thread count.
  */
object DriveMemBandwidth {
  private val N = 1 << 22 // 4M doubles per array; 3 arrays = 96 MiB/thread
  private val Reps = 8

  /** One thread's triad pass over its own arrays; returns bytes moved. */
  private final class Worker extends Thread {
    val a = new Array[Double](N)
    val b = new Array[Double](N)
    val c = new Array[Double](N)
    java.util.Arrays.fill(b, 1.5)
    java.util.Arrays.fill(c, 2.5)
    @volatile var bytes = 0L
    override def run(): Unit = {
      var r = 0
      while (r < Reps) {
        var i = 0
        while (i < N) { a(i) = b(i) + 3.0 * c(i); i += 1 }
        r += 1
      }
      // triad traffic: read b, read c, write a (ignoring write-allocate)
      bytes = 3L * 8L * N * Reps
    }
  }

  private def measure(threads: Int): Double = {
    val ws = Array.fill(threads)(new Worker)
    val t0 = System.nanoTime()
    ws.foreach(_.start())
    ws.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    ws.map(_.bytes).sum / sec / 1e9
  }

  def main(args: Array[String]): Unit = {
    measure(2) // JIT warmup, untimed
    val base = (1 to 3).map(_ => measure(1)).max
    for (t <- Seq(1, 8, 16, 32)) {
      val gbs = (1 to 3).map(_ => measure(t)).max // best-of-3
      val eff = gbs / (base * t)
      println(f"""{"threads":$t,"triad_gb_per_sec":$gbs%.1f,"per_thread_gb_per_sec":${gbs / t}%.2f,"efficiency_vs_1t":$eff%.2f}""")
    }
  }
}

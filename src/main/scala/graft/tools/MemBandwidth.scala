package graft.tools

/** Single-box DRAM-bandwidth ceiling probe (scaling-evidence support).
  *
  * The north rule's ≥0.8 N→4N criterion assumes resources multiply with
  * executors; on ONE socket the shared resource is the memory pipeline.
  * This probe streams large long-arrays (far beyond LLC) with k threads
  * and reports aggregate GB/s — if GB/s saturates between 8 and 32
  * threads, any memory-bound job on this box hits a hardware wall that a
  * real 4×-node cluster would not (each node brings its own DRAM
  * channels). Read alongside BENCH.md's shuffle_gb_per_round.
  *
  * Usage: runMain graft.tools.MemBandwidth [threadList]
  *   default threadList = 1,2,4,8,16,32
  */
object MemBandwidth {

  def main(args: Array[String]): Unit = {
    val threadCounts =
      if (args.nonEmpty) args(0).split(",").map(_.toInt).toSeq else Seq(1, 2, 4, 8, 16, 32)
    threadCounts.foreach { k =>
      val gbps = probe(k)
      println(f"""{"metric":"mem_bandwidth","threads":$k,"gb_per_sec":$gbps%.1f}""")
    }
    if (blackhole == 42) println("") // defeat dead-code elimination
  }

  /** Aggregate streaming-read GB/s with `k` threads. Also the per-draw
    * ambient-contention probe: ScalingBench runs a fixed-shape probe
    * before/after each measured level, so every BENCH draw carries a
    * hardware-state reading taken in its own noise window (round-3
    * finding: measured efficiency tracks ambient quiet monotonically —
    * a draw table without this column is uninterpretable on a shared
    * box). */
  def probe(k: Int, perThreadLongs: Int = 32 * 1024 * 1024, passes: Int = 4): Double = {
    // each thread streams its own array: pure read bandwidth, no sharing
    val arrays = Array.fill(k)(Array.tabulate(perThreadLongs)(i => i.toLong))
    // warm pass (page faults, JIT)
    arrays.foreach(a => blackhole ^= sum(a))
    val t0 = System.nanoTime()
    val threads = arrays.map { a =>
      val t = new Thread(() => {
        var p = 0
        var acc = 0L
        while (p < passes) { acc ^= sum(a); p += 1 }
        blackhole ^= acc
      })
      t.start(); t
    }
    threads.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    val bytes = k.toLong * perThreadLongs * 8L * passes
    bytes / sec / 1e9
  }

  @volatile private var blackhole: Long = 0L

  private def sum(a: Array[Long]): Long = {
    var i = 0
    var acc = 0L
    while (i < a.length) { acc += a(i); i += 1 }
    acc
  }
}

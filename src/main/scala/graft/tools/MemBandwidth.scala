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
    val perThreadLongs = 32 * 1024 * 1024 // 256 MB per thread — far past LLC
    val passes = 4
    threadCounts.foreach { k =>
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
      println(f"""{"metric":"mem_bandwidth","threads":$k,"gb_per_sec":${bytes / sec / 1e9}%.1f}""")
    }
    if (blackhole == 42) println("") // defeat dead-code elimination
  }

  @volatile private var blackhole: Long = 0L

  private def sum(a: Array[Long]): Long = {
    var i = 0
    var acc = 0L
    while (i < a.length) { acc += a(i); i += 1 }
    acc
  }
}

package graft

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.SparkSession

/** Two-parallelism scaling evidence for the north rule's N→4N criterion
  * (no real cluster in this sandbox — BASELINE.md "scaling efficiency"
  * row): the identical frontier-round job at local[8] and local[32] on the
  * same input, reporting throughput at both and the normalized efficiency
  * speedup/4. Appends a markdown row to BENCH.md.
  */
object ScalingBench {

  def runAt(cores: Int, nPages: Long): (Long, Double) = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stateDir = Files.createTempDirectory(s"graft-scaling-$cores").toString
    // one warmup round at small size to JIT/codegen before measuring
    Bench.crawlRounds(spark, Files.createTempDirectory("graft-warm").toString,
      50000, 256, rounds = 1, roundBudget = 50000)
    val out = Bench.crawlRounds(spark, stateDir, nPages, nHosts = 1024,
      rounds = 3, roundBudget = 200000)
    spark.stop()
    // allow a fresh master on the next session in this JVM
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    out
  }

  def main(args: Array[String]): Unit = {
    val nPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "400000").toLong
    val (lowC, highC) = (8, 32)
    val (f8, t8) = runAt(lowC, nPages)
    val (f32, t32) = runAt(highC, nPages)
    val thr8 = f8 / t8
    val thr32 = f32 / t32
    val speedup = thr32 / thr8
    val eff = speedup / (highC.toDouble / lowC)
    val json =
      f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","low":{"cores":$lowC,"fetches":$f8,"sec":$t8%.2f,"urls_per_sec":$thr8%.1f},"high":{"cores":$highC,"fetches":$f32,"sec":$t32%.2f,"urls_per_sec":$thr32%.1f},"speedup":$speedup%.2f,"pages":$nPages}"""
    println(json)
    val row =
      f"""| ${java.time.LocalDate.now} | $nPages pages | local[$lowC]: $thr8%.0f urls/s | local[$highC]: $thr32%.0f urls/s | speedup $speedup%.2f× | efficiency $eff%.2f |\n"""
    val bench = Paths.get("BENCH.md")
    if (!Files.exists(bench)) {
      Files.writeString(bench,
        """# BENCH — measured scaling evidence
          |
          |Frontier-dequeue + fetch-schedule rounds (Bench.crawlRounds): identical
          |job and input at two parallelism levels; efficiency = (thr_high/thr_low)
          |normalized by the 4x core ratio (north-rule criterion >= 0.8).
          |
          || date | input | low | high | speedup | efficiency |
          ||---|---|---|---|---|---|
          |""".stripMargin)
    }
    Files.writeString(bench, row, StandardOpenOption.APPEND)
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: pure-compute scaling sanity check (does local[N] on this
  * box scale at all, independent of the engine?). */
object CpuScaleCheck {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = sys.env.getOrElse("SPARK_GRAFT_CPU_N", "800000000").toLong
    // warmup
    spark.range(0L, n / 8, 1L, cores * 4).select(max(xxhash64(col("id")))).collect()
    val t0 = System.nanoTime()
    spark.range(0L, n, 1L, cores * 4)
      .select(max(xxhash64(col("id"), xxhash64(col("id"), col("id"))))).collect()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"cpu_scale","cores":$cores,"sec":$sec%.2f,"rows_per_sec":${n / sec}%.0f}""")
    spark.stop()
  }
}

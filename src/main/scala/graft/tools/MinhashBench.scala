package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

import graft.operators.Dedup
import graft.functions.TextFunctions._

/** Attribution microbench for the minhash-LSH bucket guard (round-2 VERDICT
  * what's-wrong #4: `dedup_minhash_lsh` moved 3.27 s → 4.56 s when the
  * guard landed — guard cost or VM noise?). Interleaves the guarded
  * operator with an inline guard-free twin (same plan minus the bucket-size
  * aggregate + semi filter) for `reps` alternations and prints medians —
  * same JVM, same minutes, so environment noise hits both arms equally.
  *
  * Usage: runMain graft.tools.MinhashBench [sfDir] [reps]
  */
object MinhashBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-minhash-bench")
      .config("spark.sql.shuffle.partitions", cpus.toInt * 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // guard-free twin: minhashLsh with the bucket-size aggregate + keep-join
    // removed (everything else identical)
    def unguarded(): Long = {
      val sigs = docs
        .select(col("doc_id"), explode(minhashBandsUdf(3, 64, 16)(col("text"))).as("bk"))
        .select(col("doc_id"), col("bk._1").as("band"), col("bk._2").as("bh"))
      val candidates = sigs.as("a").join(sigs.as("b"),
          col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val s = Dedup.shingleSets(docs, 3)
      val sizes = s.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      candidates
        .join(s.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
        .join(s.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sza")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("szb")), "doc_b")
        .filter(round(col("inter").cast("double") / (col("sza") + col("szb") - col("inter")), 4)
          >= 0.8)
        .count()
    }
    def guarded(): Long = Dedup.minhashLsh(docs).count()

    def time(f: () => Long): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    // warmup both arms, then alternate
    guarded(); unguarded()
    val g = Vector.newBuilder[Double]; val u = Vector.newBuilder[Double]
    (0 until reps).foreach { _ => g += time(guarded _); u += time(unguarded _) }
    def med(xs: Vector[Double]) = xs.sorted.apply(xs.size / 2)
    val (gs, us) = (g.result(), u.result())
    println(f"""{"metric":"minhash_guard_attribution","sf":"$sfDir","reps":$reps,"guarded_sec":[${gs.map(x => f"$x%.2f").mkString(",")}],"unguarded_sec":[${us.map(x => f"$x%.2f").mkString(",")}],"guarded_median":${med(gs)}%.2f,"unguarded_median":${med(us)}%.2f,"guard_overhead_sec":${med(gs) - med(us)}%.2f}""")
    spark.stop()
  }
}

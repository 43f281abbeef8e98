package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.CrawlConfig
import graft.corpus.{CorpusGen, CorpusTable}
import graft.frontier.SnapshotStore
import graft.round.CrawlEngine

/** Dev harness: time a full test-scale crawl (the CrawlEngineSpec shape). */
object ProfileCrawl {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val spec = CorpusGen.Spec()
    val cfg = CrawlConfig(hostBudgetPerRound = 2, roundBudget = 12, maxRounds = 40)
    val corpus = CorpusTable.create(spark, spec)
    // warmup
    val warmDir = java.nio.file.Files.createTempDirectory("graft-warm").toString
    CrawlEngine.crawl(spark, new SnapshotStore(warmDir, spark), corpus, CorpusGen.seeds(spec), cfg.copy(maxRounds = 2))
    val t0 = System.nanoTime()
    val stateDir = java.nio.file.Files.createTempDirectory("graft-profilecrawl").toString
    val summary = CrawlEngine.crawl(spark, new SnapshotStore(stateDir, spark), corpus, CorpusGen.seeds(spec), cfg)
    println(f"[profile] full crawl: rounds=${summary.rounds} fetches=${summary.fetches} in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}

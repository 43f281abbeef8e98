package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core._
import graft.round.CrawlEngine

/** Dev profiling harness: times each phase of one crawl round at bench
  * scale to locate per-round overhead. Not part of the driver contract. */
object ProfileRound {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "400000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val x = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); x
    }

    val corpus = graft.corpus.CorpusTable.createLarge(spark, nPages, 1024)
    val corpusN = time("corpusNorm persist")(
      { val c = CrawlEngine.corpusStaged(spark, corpus); c.count(); c })

    val frontier = time("frontier build persist") {
      val f = corpusN.select(
        monotonically_increasing_id().as("id"),
        col("urlNorm").as("url"), col("urlNorm"),
        regexp_extract(col("urlNorm"), "https://([^/]+)/", 1).as("host"),
        lit(TaskStatus.Wait).as("status"),
        lit(0).as("attempt"), lit(0).as("priority"),
        col("warcTs"), lit(0).as("discoveredRound")).persist()
      f.count(); f
    }
    val hosts = Seq.empty[(String, Long)].toDF("host", "nextTick")
    val cfg = CrawlConfig(hostBudgetPerRound = 64, roundBudget = 200000,
      politenessCenterTicks = 0, politenessRadiusTicks = 0)
    val round = 0

    val eligible = frontier
      .filter(col("status") === TaskStatus.Wait)
      .join(hosts, Seq("host"), "left")
      .filter(coalesce(col("nextTick"), lit(0L)) <= round)
      .drop("nextTick")
    time("eligible count")(eligible.count())

    val salts = 8
    val w1 = Window.partitionBy(col("host"), col("salt")).orderBy(CrawlEngine.FetchOrder: _*)
    val w2 = Window.partitionBy(col("host")).orderBy(CrawlEngine.FetchOrder: _*)
    val perHost = eligible
      .withColumn("salt", pmod(xxhash64(col("urlNorm")), lit(salts)))
      .withColumn("r1", row_number().over(w1)).filter(col("r1") <= cfg.hostBudgetPerRound)
      .withColumn("r2", row_number().over(w2)).filter(col("r2") <= cfg.hostBudgetPerRound)
      .drop("salt", "r1", "r2")
    time("perHost rank count")(perHost.count())

    val selected = perHost.orderBy(CrawlEngine.FetchOrder: _*).limit(cfg.roundBudget)
      .withColumn("seq", row_number().over(Window.orderBy(CrawlEngine.FetchOrder: _*)))
    time("selected+seq count")(selected.count())

    val selPersist = time("selected persist")(
      { val s = selected.persist(); s.count(); s })

    val fetched = selPersist
      .join(corpusN.select("urlNorm", "htmlStr", "lang"), Seq("urlNorm"), "left")
      .withColumn("parsed", CrawlEngine.parseUdf(col("htmlStr"), col("host")))
      .withColumn("ioUntil", CrawlEngine.ioFailUntilUdf(col("lang")))
      .withColumn("outcome",
        when(col("htmlStr").isNull, Outcome.NotFound)
          .when(col("lang") === "xx-ban", Outcome.Banned)
          .when(col("ioUntil") > round, Outcome.IoFailed)
          .when(col("lang") === "xx-gen", Outcome.GenericFailed)
          .when(col("parsed.text").isNull, Outcome.ParsingFailed)
          .otherwise(Outcome.Success))
      .persist()
    time("fetch join + classify persist")(fetched.count())

    val records = fetched.select(
      lit(round).as("round"), col("seq"), col("id"), col("urlNorm"),
      col("outcome"), col("parsed.text").as("extractedText"),
      when(col("outcome") === Outcome.Success, size(col("parsed.links")))
        .otherwise(lit(0)).cast("int").as("nNewLinks"))
    time("records write")(records.write.mode("overwrite")
      .parquet("/tmp/graft-profile/results"))

    val discovered = fetched
      .filter(col("outcome") === Outcome.Success)
      .select(col("seq"), col("urlNorm").as("parentUrl"),
        posexplode(col("parsed.links")).as(Seq("pos", "href")))
      .withColumn("newNorm", graft.functions.expressions.UrlFunctions.urlResolve(col("parentUrl"), col("href")))
      .filter(col("newNorm").isNotNull)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("newNorm")).orderBy(col("seq"), col("pos"))))
      .filter(col("rn") === 1)
      .join(frontier.select(col("urlNorm").as("newNorm")), Seq("newNorm"), "left_anti")
      .withColumn("idx", row_number().over(Window.orderBy(col("seq"), col("pos"))))
      .select(
        (col("idx").cast("long") + lit(1000000L)).as("id"),
        col("newNorm").as("url"), col("newNorm").as("urlNorm"),
        graft.functions.expressions.UrlFunctions.urlHost(col("newNorm")).as("host"),
        lit(TaskStatus.Wait).as("status"),
        lit(0).as("attempt"), lit(0).as("priority"),
        lit(round + 1).as("discoveredRound"))
      .join(corpusN.select(col("urlNorm"), col("warcTs")), Seq("urlNorm"), "left")
      .select(col("id"), col("url"), col("urlNorm"), col("host"), col("status"),
        col("attempt"), col("priority"), col("warcTs"), col("discoveredRound"))
      .persist()
    time("discovered persist")(discovered.count())

    val outcomes = fetched.select(col("id"), col("outcome"))
    val updated = frontier
      .join(broadcast(outcomes), Seq("id"), "left")
      .withColumn("newStatus",
        when(col("outcome").isNull, col("status"))
          .otherwise(TaskStatus.Finished))
      .select(col("id"), col("url"), col("urlNorm"), col("host"),
        col("newStatus").as("status"), col("attempt"),
        col("priority"), col("warcTs"), col("discoveredRound"))
    val frontier2 = updated.unionByName(discovered)
    time("frontier2 write")(frontier2.write.mode("overwrite")
      .parquet("/tmp/graft-profile/frontier"))

    time("frontier2 re-read count")(
      spark.read.parquet("/tmp/graft-profile/frontier").count())
    spark.stop()
  }
}

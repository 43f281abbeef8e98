package graft.job

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.core.CrawlConfig
import graft.corpus.{CorpusGen, CorpusTable}
import graft.round.{CrawlEngine, DefaultParser, PageParser, ParquetParsedSink, ParquetRawSink}

/** The public pipeline-builder contract, porting the reference's build-time
  * validation rules (`worker/.../pipeline/PipelineBuilder.scala:56-68`):
  * taskType + crawler mandatory, parser ⇔ saveParsedProvider paired. */
class CrawlPipelineSpec extends AnyFunSuite with SparkSpec {

  private val spec = CorpusGen.Spec(nHosts = 3, pagesPerHost = 8)
  private def corpus = CorpusTable.create(spark, spec)
  private val cfg = CrawlConfig(hostBudgetPerRound = 2, roundBudget = 8, maxRounds = 10)

  test("taskType is mandatory") {
    val e = intercept[IllegalArgumentException] {
      CrawlPipeline.builder().withCorpus(corpus).build()
    }
    assert(e.getMessage.contains("taskType"))
  }

  test("corpus (crawler) is mandatory") {
    val e = intercept[IllegalArgumentException] {
      CrawlPipeline.builder().withTaskType("t").build()
    }
    assert(e.getMessage.contains("corpus"))
  }

  test("a parser requires a parsed sink, and vice versa") {
    val base = CrawlPipeline.builder().withTaskType("t").withCorpus(corpus)
    assert(intercept[IllegalArgumentException] {
      base.withParser(DefaultParser).build()
    }.getMessage.contains("parsed sink"))
    val e2 = intercept[IllegalArgumentException] {
      CrawlPipeline.builder().withTaskType("t").withCorpus(corpus)
        .addParsedSink(ParquetParsedSink("/tmp/unused")).build()
    }
    assert(e2.getMessage.contains("parser"))
  }

  test("notifiers fire on stop with the right reason (completed / maxRounds)") {
    import graft.round.{CrawlNotifier, StopReason}
    def runWith(c: CrawlConfig): List[String] = {
      val stops = scala.collection.mutable.Buffer.empty[String]
      CrawlPipeline.builder()
        .withTaskType("t").withCorpus(corpus)
        .withSeeds(CorpusGen.seeds(spec)).withConfig(c)
        .addNotifier(new CrawlNotifier {
          override def onStop(reason: String, s: CrawlEngine.CrawlSummary): Unit =
            stops += reason
        })
        .build().run(spark, Files.createTempDirectory("graft-pipe-stop").toString)
      stops.toList
    }
    assert(runWith(cfg.copy(maxRounds = 100)) == List(StopReason.Completed))
    assert(runWith(cfg.copy(maxRounds = 1)) == List(StopReason.MaxRounds))
  }

  test("built pipeline runs end-to-end with custom parser, validator and sinks") {
    val stateDir = Files.createTempDirectory("graft-pipe").toString
    val rawDir = Files.createTempDirectory("graft-pipe-raw").toString
    val parsedDir = Files.createTempDirectory("graft-pipe-parsed").toString
    // custom parser: default extraction but uppercased text (observable)
    object UpperParser extends PageParser {
      override def parse(html: String, host: String): CrawlEngine.Parsed = {
        val p = DefaultParser.parse(html, host)
        p.copy(text = p.text.map(_.toUpperCase))
      }
    }
    val pipeline = CrawlPipeline.builder()
      .withTaskType("pages")
      .withCorpus(corpus)
      .withSeeds(CorpusGen.seeds(spec))
      .withConfig(cfg)
      .withParser(UpperParser)
      .withValidator(col("urlNorm").contains("/p5"))
      .addRawSink(ParquetRawSink(rawDir))
      .addParsedSink(ParquetParsedSink(parsedDir))
      .build()
    assert(pipeline.cfg.projects.head.projectId == "pages")
    val summary = pipeline.run(spark, stateDir)
    assert(summary.fetches > 0)
    // sinks wrote one versioned dir per committed round
    val rawVersions = new java.io.File(rawDir).list().count(_.startsWith("v="))
    assert(rawVersions == summary.versions, s"raw sink wrote $rawVersions of ${summary.versions}")
    val parsed = spark.read.parquet(s"$parsedDir/v=*")
    assert(parsed.count() == summary.fetches)
    // custom parser observable end-to-end: extracted text is uppercased
    val texts = parsed.filter(col("extractedText").isNotNull)
      .select("extractedText").collect().map(_.getString(0))
    assert(texts.nonEmpty && texts.forall(t => t == t.toUpperCase))
    // raw sink carries the fetched html bytes
    val raw = spark.read.parquet(s"$rawDir/v=*")
    assert(raw.columns.contains("htmlStr") && raw.count() == summary.fetches)
  }
}

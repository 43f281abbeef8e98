package graft.job

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.core.{CrawlConfig, ProjectSpec}
import graft.frontier.SnapshotStore
import graft.round.{CrawlEngine, CrawlNotifier, PageParser, ParsedSink, PipelineHooks, RawSink}

/** Public pipeline surface of the engine — the Spark-native mirror of the
  * reference's `PipelineBuilder` (`worker/.../pipeline/PipelineBuilder
  * .scala:12-87`) and `ConfigurablePipelineBuilder`. The reference
  * validates at build time (:56-68): taskType and crawler are mandatory;
  * a parser and its saveParsedProvider must be configured together. This
  * builder enforces the same contract: taskType and corpus (the fetch-join
  * "crawler") are mandatory, and a custom parser ⇔ at least one parsed
  * sink.
  */
final case class CrawlPipeline(
    taskType: String,
    corpus: DataFrame,
    seeds: Seq[(String, Int)],
    cfg: CrawlConfig,
    hooks: PipelineHooks) {

  /** Run (or resume) the crawl against `stateDir`. */
  def run(spark: SparkSession, stateDir: String): CrawlEngine.CrawlSummary =
    CrawlEngine.crawl(spark, new SnapshotStore(stateDir, spark), corpus, seeds, cfg, hooks)
}

object CrawlPipeline {

  def builder(): Builder = new Builder

  final class Builder private[CrawlPipeline] {
    private var taskType: Option[String] = None
    private var corpus: Option[DataFrame] = None
    private var seeds: Seq[(String, Int)] = Nil
    private var cfg: CrawlConfig = CrawlConfig()
    private var parser: Option[PageParser] = None
    private var validator: Option[Column] = None
    private var rawSinks: Seq[RawSink] = Nil
    private var parsedSinks: Seq[ParsedSink] = Nil
    private var notifiers: Seq[CrawlNotifier] = Nil

    /** Mandatory (`PipelineBuilder.scala:57-59`). */
    def withTaskType(t: String): Builder = { taskType = Some(t); this }
    /** Mandatory — the corpus table IS the crawler: fetching is the C4
      * equi-join against it (`PipelineBuilder.scala:60-62` crawler). */
    def withCorpus(c: DataFrame): Builder = { corpus = Some(c); this }
    def withSeeds(s: Seq[(String, Int)]): Builder = { seeds = s; this }
    def withConfig(c: CrawlConfig): Builder = { cfg = c; this }
    /** Optional, but then a parsed sink is mandatory (`PipelineBuilder
      * .scala:63-68` parser ⇔ saveParsedProvider pairing). */
    def withParser(p: PageParser): Builder = { parser = Some(p); this }
    /** B5 batch-task validator as a Column predicate over the leased row. */
    def withValidator(v: Column): Builder = { validator = Some(v); this }
    def addRawSink(s: RawSink): Builder = { rawSinks :+= s; this }
    def addParsedSink(s: ParsedSink): Builder = { parsedSinks :+= s; this }
    /** Notification hook (`NotificationExecutor` analog): called once when
      * the crawl stops, with the [[graft.round.StopReason]]. */
    def addNotifier(n: CrawlNotifier): Builder = { notifiers :+= n; this }

    def build(): CrawlPipeline = {
      val t = taskType.getOrElse(
        throw new IllegalArgumentException("taskType is required"))
      val c = corpus.getOrElse(
        throw new IllegalArgumentException("corpus (crawler) is required"))
      if (parser.isDefined && parsedSinks.isEmpty)
        throw new IllegalArgumentException(
          "a parser requires at least one parsed sink (parser ⇔ saveParsedProvider)")
      if (parser.isEmpty && parsedSinks.nonEmpty)
        throw new IllegalArgumentException(
          "a parsed sink requires a parser (parser ⇔ saveParsedProvider)")
      // the pipeline's task type becomes the (single) registered project
      // unless the config already multiplexes projects
      val cfgWithProject =
        if (cfg.projects != Seq(ProjectSpec.default)) cfg
        else cfg.copy(projects = Seq(ProjectSpec(t, t, t)))
      val hooks = PipelineHooks(
        parser = parser.getOrElse(graft.round.DefaultParser),
        validator = validator,
        rawSinks = rawSinks,
        parsedSinks = parsedSinks,
        notifiers = notifiers)
      CrawlPipeline(t, c, seeds, cfgWithProject, hooks)
    }
  }
}

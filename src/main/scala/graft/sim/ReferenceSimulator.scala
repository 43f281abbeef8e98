package graft.sim

import scala.collection.mutable
import graft.core._

/** Clean-room, in-memory reimplementation of the reference crawler's
  * scheduling semantics (jaitl/cloud-crawler), bulk-synchronous-round form.
  *
  * This is the correctness ORACLE (SURVEY.md §5 item 3): the Spark engine's
  * output sequence `(round, seq, urlNorm, outcome)` must equal this
  * simulator's output exactly, for the same corpus + seeds + budget. It
  * transliterates the semantics of the reference actors — lease batch
  * (`QueueTaskServiceImpl.scala:57-66`), politeness gate
  * (`TorResourceController.scala:57-103`), outcome taxonomy
  * (`ResourceHelper.scala:10-28`), retry split
  * (`QueueTaskServiceImpl.scala:101-115`), link push + dedup
  * (`SqlQueueTaskProvider.scala:56-78`) — into deterministic rounds.
  *
  * Spec (shared with the Spark engine — every draw is seeded, SURVEY §7.4):
  *  - round r: eligible = status==taskWait && r >= hostNextTick(host)
  *  - per-host rank by (priority DESC, warc_ts ASC NULLS LAST, id ASC),
  *    keep top `hostBudget` (north-star window R1)
  *  - global cut by the same order, keep top `roundBudget`, seq = 1-based
  *    rank (R2)
  *  - outcomes: missing page → notFound→taskSkipped; lang "xx-ban" → banned
  *    → dropped + host parked banBackoff; lang "xx-ioN" → ioFailed while
  *    r < N → requeued WITHOUT attempt increment (TasksBatchController:163-166);
  *    lang "xx-gen" → genericFailed → attempt+1, taskFailed at maxAttempts
  *    (QueueTaskServiceImpl:101-115); malformed html → taskParsingFailed;
  *    else success → taskFinished + links
  *  - links: raw hrefs filtered by the reference predicate
  *    (HabrParser.scala:22-26) against the parent host, resolved + normalized
  *    (north-star addition), robots-checked at insert, first-occurrence dedup
  *    against the whole frontier (C2/C3), ids assigned in (seq, pos) order
  *  - hosts fetched in round r reopen at r + 1 + max(politenessDelay,
  *    crawl-delay); banned hosts at r + 1 + banBackoff
  *  - if nothing eligible but waits remain, the round counter jumps to the
  *    earliest host reopen tick
  */
object ReferenceSimulator {

  final case class SimPage(url: String, warcTsMicros: Long, html: String, text: String, lang: String)

  final case class SimEntry(
      id: Long, url: String, urlNorm: String, host: String,
      var status: String, var attempt: Int, priority: Int,
      warcTs: Option[Long], discoveredRound: Int,
      projectId: String = "default", taskType: String = "default")

  final case class SimFetch(
      round: Int, seq: Int, id: Long, urlNorm: String, outcome: String,
      extractedText: Option[String], nNewLinks: Int)

  final case class SimResult(
      fetches: Vector[SimFetch],
      frontier: Vector[SimEntry],
      hostNext: Map[String, Long],
      rounds: Int,
      // A5 per-batch resource acquisitions: (round, resource, usedAfter) —
      // least-used pick with id-asc tiebreak, the deterministic twin of
      // `MongoConfigurationProvider.scala:59-99` findOneAndUpdate(sort asc
      // usedCount, inc usedCount)
      resourceLog: Vector[(Int, String, Long)] = Vector.empty)

  private val IoLang = "^xx-io(\\d+)$".r

  def classify(page: Option[SimPage], round: Int): (String, Option[String], Seq[String]) =
    page match {
      case None => (Outcome.NotFound, None, Nil)
      case Some(p) =>
        p.lang match {
          case "xx-ban" => (Outcome.Banned, None, Nil)
          case IoLang(n) if round < n.toInt => (Outcome.IoFailed, None, Nil)
          case "xx-gen" => (Outcome.GenericFailed, None, Nil)
          case _ =>
            HtmlCodec.extractText(p.html) match {
              case None => (Outcome.ParsingFailed, None, Nil)
              case Some(t) => (Outcome.Success, Some(t), HtmlCodec.extractLinks(p.html))
            }
        }
    }

  /** Ordering key shared by R1 and R2: priority DESC, warc_ts ASC NULLS
    * LAST, id ASC. */
  private def rankLt(a: SimEntry, b: SimEntry): Boolean = {
    if (a.priority != b.priority) a.priority > b.priority
    else (a.warcTs, b.warcTs) match {
      case (Some(x), Some(y)) if x != y => x < y
      case (Some(_), None) => true
      case (None, Some(_)) => false
      case _ => a.id < b.id
    }
  }

  def run(
      corpus: Map[String, SimPage], // keyed by normalized url
      seeds: Seq[(String, Int)],    // (raw url, priority) in seed order
      cfg: CrawlConfig,
      // B5 validator twin: leased tasks it flags bypass the fetch and end
      // taskSkipped (`WorkerManager.scala:71-72`, `TasksBatchController
      // .scala:113-119`)
      validator: String => Boolean = _ => false): SimResult = {
    val nextByProject = cfg.projects.map(p => p.projectId -> p.nextProjectId).toMap
    val typeByProject = cfg.projects.map(p => p.projectId -> p.taskType).toMap
    val taskTypes = cfg.projects.map(_.taskType).distinct.sorted

    // robots rules per host, read statically from the corpus
    val robots: Map[String, Robots.Rules] = corpus.collect {
      case (urlNorm, p) if UrlNormalizer.pathOf(urlNorm) == "/robots.txt" =>
        UrlNormalizer.hostOf(urlNorm) -> Robots.parse(p.text)
    }
    def robotsAllowed(host: String, urlNorm: String): Boolean =
      robots.get(host).forall(r => Robots.allowed(r, UrlNormalizer.pathOf(urlNorm)))
    def crawlDelayTicks(host: String): Long =
      robots.get(host).flatMap(_.crawlDelay).map(d => math.ceil(d).toLong).getOrElse(0L)

    val frontier = mutable.LinkedHashMap.empty[String, SimEntry] // urlNorm → entry
    val hostNext = mutable.Map.empty[String, Long]
    val hostFail = mutable.Map.empty[String, Int] // D3 circuit breaker
    val DeadTick = Int.MaxValue.toLong
    var nextId = 0L

    def insert(rawUrl: String, priority: Int, round: Int, projectId: String): Unit =
      UrlNormalizer.normalize(rawUrl).foreach { urlNorm =>
        if (!frontier.contains(urlNorm)) {
          val host = UrlNormalizer.hostOf(urlNorm)
          val status =
            if (robotsAllowed(host, urlNorm)) TaskStatus.Wait else TaskStatus.Skipped
          frontier(urlNorm) = SimEntry(
            nextId, rawUrl, urlNorm, host, status, 0, priority,
            corpus.get(urlNorm).map(_.warcTsMicros), round,
            projectId, typeByProject.getOrElse(projectId, cfg.projects.head.taskType))
          nextId += 1
        }
      }

    seeds.foreach { case (u, p) => insert(u, p, 0, cfg.projects.head.projectId) }

    val fetches = Vector.newBuilder[SimFetch]
    val resourceLog = Vector.newBuilder[(Int, String, Long)]
    val resourceUsed = mutable.Map.empty[String, Long].withDefaultValue(0L)
    // pool-level breaker (`TorResourceController.scala:59-60,86-96`):
    // failures accumulate against the resource that served the batch
    val resourceFail = mutable.Map.empty[String, Long].withDefaultValue(0L)
    def openResources: Seq[String] =
      if (cfg.maxResourceFailures <= 0) cfg.resources
      else cfg.resources.filter(r => resourceFail(r) < cfg.maxResourceFailures)
    var round = 0
    var done = false
    while (!done && round < cfg.maxRounds) {
      val waits = frontier.values.filter(_.status == TaskStatus.Wait).toVector
      if (waits.isEmpty) done = true
      else if (openResources.isEmpty) done = true // pool exhausted: NoResourcesAvailable
      else {
        // lease multiplexing: one seeded-pick task type per round
        // (`QueueTaskServiceImpl.scala:32-55`); single-type crawls skip it
        val pickedType =
          if (taskTypes.size <= 1) None
          else Some(taskTypes(Det.pmod(Det.xxhash64(s"taskType:$round"), taskTypes.size).toInt))
        val eligible = waits.filter(e => round >= hostNext.getOrElse(e.host, 0L) &&
          pickedType.forall(_ == e.taskType))
        if (eligible.isEmpty) {
          // jump to the earliest reopen tick among hosts that still have
          // waits; if every such host is closed → NoResourcesAvailable stop.
          // With multiplexed types the pick rotates per round, so the jump
          // is only one tick: another type may be eligible next round.
          val minNext = waits.map(e => hostNext.getOrElse(e.host, 0L)).min
          if (minNext >= DeadTick) done = true
          else if (pickedType.isDefined && waits.exists(e => round >= hostNext.getOrElse(e.host, 0L)))
            round += 1
          else round = math.max(round + 1, minNext.toInt)
        } else {
          // R1 per-host top-k, then R2 global cut, same order
          val perHost = eligible.groupBy(_.host).values.flatMap { es =>
            es.sortWith(rankLt).take(cfg.hostBudgetPerRound)
          }.toVector
          val selected = perHost.sortWith(rankLt).take(cfg.roundBudget)

          // A5: the batch acquires the least-used OPEN resource and bumps
          // its usedCount (one acquisition per leased batch); resources at
          // the failure cap are closed and never picked again
          val resource = openResources.minBy(r => (resourceUsed(r), r))
          resourceUsed(resource) += 1
          resourceLog += ((round, resource, resourceUsed(resource)))

          val bannedHosts = mutable.Set.empty[String]
          val newLinks = Vector.newBuilder[(String, String)] // (rawHref resolved later) parent info
          var seq = 0
          val roundFetches = selected.map { e =>
            seq += 1
            val (outcome, text, links) =
              if (validator(e.urlNorm)) (Outcome.Skipped, None, Nil)
              else classify(corpus.get(e.urlNorm), round)
            // status transition (QueueTaskServiceImpl.scala:78-167 semantics)
            outcome match {
              case Outcome.Skipped => e.status = TaskStatus.Skipped
              case Outcome.Success => e.status = TaskStatus.Finished
              case Outcome.Banned =>
                e.status = TaskStatus.Finished // dropped with successes (:80)
                bannedHosts += e.host
              case Outcome.NotFound => e.status = TaskStatus.Skipped
              case Outcome.ParsingFailed => e.status = TaskStatus.ParsingFailed
              case Outcome.IoFailed => e.status = TaskStatus.Wait // no attempt inc
              case Outcome.GenericFailed =>
                e.attempt += 1
                e.status =
                  if (e.attempt >= cfg.maxAttempts) TaskStatus.Failed
                  else TaskStatus.Wait
            }
            // link discovery in document order, reference filter on RAW href
            val kept = links.filter(h => HtmlCodec.keepLink(h, e.host))
            kept.foreach(h => newLinks += ((e.urlNorm, h)))
            SimFetch(round, seq, e.id, e.urlNorm, outcome, text, kept.size)
          }
          fetches ++= roundFetches

          // push discovered urls (A14 + C2 dedup, first-occurrence order);
          // links chain to the parent project's nextProjectId
          newLinks.result().foreach { case (parentUrl, href) =>
            val parentProject = frontier(parentUrl).projectId
            val newProject = nextByProject.getOrElse(parentProject, parentProject)
            UrlNormalizer.resolve(parentUrl, href).foreach(n => insert(n, 0, round + 1, newProject))
          }

          // pool breaker: the round's fetch failures charge the resource
          // that served the batch
          resourceFail(resource) += roundFetches.count(f =>
            f.outcome == Outcome.IoFailed || f.outcome == Outcome.GenericFailed)

          // politeness: every fetched host parks (F2); banned overrides
          // (F3); failCount at cap closes the host for good (D3)
          val failsByHost = roundFetches
            .filter(f => f.outcome == Outcome.IoFailed || f.outcome == Outcome.GenericFailed)
            .groupBy(f => frontier(f.urlNorm).host).view.mapValues(_.size).toMap
          selected.map(_.host).distinct.foreach { h =>
            hostFail(h) = hostFail.getOrElse(h, 0) + failsByHost.getOrElse(h, 0)
            val delay =
              if (bannedHosts(h)) cfg.banBackoffTicks
              else math.max(
                Det.politenessDelay(h, round, cfg.politenessCenterTicks, cfg.politenessRadiusTicks),
                crawlDelayTicks(h))
            hostNext(h) =
              if (cfg.maxHostFailures > 0 && hostFail(h) >= cfg.maxHostFailures) DeadTick
              else round + 1 + delay
          }
          round += 1
        }
      }
    }
    SimResult(fetches.result(), frontier.values.toVector, hostNext.toMap, round,
      resourceLog.result())
  }
}

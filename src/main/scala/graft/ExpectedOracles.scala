package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.SparkSession

import graft.core.Det
import graft.corpus.CorpusGen
import graft.functions.TextCore
import graft.sim.ReferenceSimulator

/** Independent expected outputs for the queries whose semantics DuckDB SQL
  * cannot express directly (xxhash64 politeness, simhash banding, IVF
  * probing, the crawl engine's round loop). Each is computed OUTSIDE the
  * Spark operator under test — the clean-room reference simulator
  * (`graft.sim.ReferenceSimulator`, transliterating
  * `TasksBatchController.scala:102-198` + `QueueTaskServiceImpl.scala:57-115`)
  * or a direct single-threaded Scala evaluation of the documented
  * definition — and persisted as parquet so the driver's DuckDB oracle can
  * SELECT the part files by absolute glob path (see [[sqlFor]]) and
  * hash-compare them against the Spark result (VERDICT.md round-1 item 1).
  *
  * Spark appears below only as a parquet reader/writer; every expected
  * value is produced by plain driver-side Scala.
  */
object ExpectedOracles {

  /** Absolute base dir shared between the writer (Verify) and the SQL
    * literals in SparkEntry.oracleSql — both run in the same process, so
    * the path is resolved once against the working directory. */
  val baseDir: String = new java.io.File("target/verify_expected").getAbsolutePath

  def sqlFor(name: String): String =
    s"SELECT * FROM '$baseDir/$name/*.parquet'"

  /** Spark SQL round(x, 4) semantics: HALF_UP on the decimal string form. */
  private def round4(x: Double): Double =
    JBigDecimal.valueOf(x).setScale(4, RoundingMode.HALF_UP).doubleValue()

  // ---------------------------------------------------------------- crawl
  /** Simulator run matching SparkEntry's crawl queries (same spec + cfg). */
  private lazy val sim =
    ReferenceSimulator.run(
      CorpusGen.simCorpus(SparkEntry.crawlSpec),
      CorpusGen.seeds(SparkEntry.crawlSpec),
      SparkEntry.crawlCfg)

  def crawlFetchSchedule: Seq[(Int, Int, Long, String, String, Option[String], Int)] =
    sim.fetches.map(f =>
      (f.round, f.seq, f.id, f.urlNorm, f.outcome, f.extractedText, f.nNewLinks))

  def crawlFrontierFinal: Seq[(Long, String, String, String, Int, Int)] =
    sim.frontier.map(e => (e.id, e.urlNorm, e.host, e.status, e.attempt, e.priority))
      .sortBy(_._1)

  /** A5 least-used resource acquisitions, straight from the simulator. */
  def resourceUsed: Seq[(Int, String, Long)] = sim.resourceLog

  /** Simulator run for the pool-breaker + write-back scenario (same spec +
    * cfg as SparkEntry.breakerState). */
  private lazy val simBreaker =
    ReferenceSimulator.run(
      CorpusGen.simCorpus(SparkEntry.breakerSpec),
      CorpusGen.seeds(SparkEntry.breakerSpec),
      SparkEntry.breakerCfg)

  /** Resource log under the pool breaker: proxy-a parks at the failure cap,
    * proxy-b serves the remaining rounds, the crawl stops when both close. */
  def resourceBreaker: Seq[(Int, String, Long)] = simBreaker.resourceLog

  /** A12 write-back expectation: the final frontier with each row's
    * `source` = extractedText of its successful fetch (None until/unless
    * one happened) — the simulator twin of `update projects_url set
    * source=… where id=…`. */
  def frontierWriteback: Seq[(Long, String, String, Option[String])] = {
    val sourceById = simBreaker.fetches
      .filter(f => f.outcome == graft.core.Outcome.Success)
      .map(f => f.id -> f.extractedText).toMap
    simBreaker.frontier
      .map(e => (e.id, e.urlNorm, e.status, sourceById.get(e.id).flatten))
      .sortBy(_._1)
  }

  // ---------------------------------------------------- politeness (F2)
  /** Det.politenessDelay evaluated in plain Scala over the same
    * (user, round) grid as CrawlOps.politenessSchedule — this cross-checks
    * that driver-side Det.xxhash64 and Spark SQL's xxhash64 expression
    * agree bit-for-bit (the whole determinism story rests on it). */
  def politenessSchedule(userIds: Seq[Long], center: Long = 2L, radius: Long = 2L)
      : Seq[(Long, String, Int, Long, Long)] =
    for {
      u <- userIds.sorted
      r <- 0 to 3
    } yield {
      val host = s"host$u"
      val delay = Det.politenessDelay(host, r, center, radius)
      (u, host, r, delay, r + 1 + delay)
    }

  // ------------------------------------------------------ simhash dedup
  /** Exhaustive all-pairs Hamming scan over pure-Scala simhash
    * fingerprints — the banding-free ground truth the 4×16-bit LSH join
    * must reproduce exactly for maxHamming ≤ 3 (pigeonhole recall). */
  def simhashPairs(docs: Seq[(Long, String)], maxHamming: Int = 3)
      : Seq[(Long, Long, Int)] = {
    val fps = docs.map { case (id, text) => (id, TextCore.simhash(TextCore.tokensOf(text))) }
      .sortBy(_._1).toArray
    val out = Seq.newBuilder[(Long, Long, Int)]
    var i = 0
    while (i < fps.length) {
      var j = i + 1
      while (j < fps.length) {
        val h = java.lang.Long.bitCount(fps(i)._2 ^ fps(j)._2)
        if (h <= maxHamming) out += ((fps(i)._1, fps(j)._1, h))
        j += 1
      }
      i += 1
    }
    out.result()
  }

  // ------------------------------------------------------------ IVF ANN
  /** Single-threaded replica of Similarity.ivfTopK's definition: stride
    * coarse quantizer, nearest-centroid inversion, nprobe probe lists,
    * rounded-cosine rank. Arithmetic matches TextCore.dot (sequential
    * double accumulation) so results are bit-identical. */
  def ivfTopK(vecs: Seq[(Long, Seq[Float])], nQueries: Int = 8, k: Int = 10,
              centroidStride: Int = 50, nprobe: Int = 8)
      : Seq[(Long, Int, Long, Double)] = {
    final case class P(id: Long, v: Array[Double], nrm: Double)
    val prepared = vecs.map { case (id, e) =>
      val v = TextCore.toDouble(e); P(id, v, TextCore.norm(v))
    }
    val centroids = prepared.filter(p => Det.pmod(p.id, centroidStride.toLong) == 0)
    // invert: nearest centroid per vector by (csim desc, cid asc);
    // csim = dot(cv, v) / (cn * nrm) — same operand order as the Spark plan
    val assigned: Map[Long, Seq[P]] = prepared.map { p =>
      val best = centroids
        .map(c => (c.id, TextCore.dot(c.v, p.v) / (c.nrm * p.nrm)))
        .minBy { case (cid, csim) => (-csim, cid) }
      (best._1, p)
    }.groupBy(_._1).map { case (cid, ps) => cid -> ps.map(_._2) }
    val queries = prepared.filter(_.id < nQueries)
    queries.sortBy(_.id).flatMap { q =>
      val probeCids = centroids
        .map(c => (c.id, TextCore.dot(c.v, q.v) / (c.nrm * q.nrm)))
        .sortBy { case (cid, qsim) => (-qsim, cid) }
        .take(nprobe).map(_._1)
      val candidates = probeCids.flatMap(cid => assigned.getOrElse(cid, Nil))
        .filter(_.id != q.id)
      candidates
        .map(p => (p.id, round4(TextCore.dot(q.v, p.v) / (q.nrm * p.nrm))))
        .sortBy { case (id, cos) => (-cos, id) }
        .take(k).zipWithIndex
        .map { case ((id, cos), i) => (q.id, i + 1, id, cos) }
    }
  }

  /** Write every expected table under [[baseDir]] (called by Verify before
    * it dumps oracle_sql.json, so the SQL's paths exist when DuckDB runs). */
  def writeAll(spark: SparkSession, sfDir: String): Unit = {
    import spark.implicits._
    def write(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$baseDir/$name")

    write("crawl_fetch_schedule",
      crawlFetchSchedule.toDF("round", "seq", "id", "urlNorm", "outcome",
        "extractedText", "nNewLinks"))
    write("crawl_frontier_final",
      crawlFrontierFinal.toDF("id", "urlNorm", "host", "status", "attempt", "priority"))
    write("resource_used",
      resourceUsed.toDF("round", "resource", "used_after"))
    write("resource_breaker",
      resourceBreaker.toDF("round", "resource", "used_after"))
    write("frontier_writeback",
      frontierWriteback.toDF("id", "urlNorm", "status", "source"))

    val userIds = spark.read.parquet(s"$sfDir/events.parquet")
      .select("user_id").distinct().collect().map(_.getLong(0)).toSeq
    write("politeness_schedule",
      politenessSchedule(userIds).toDF("user_id", "host", "round", "delay_ticks", "reopen_tick"))

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    write("dedup_simhash", simhashPairs(docs).toDF("doc_a", "doc_b", "hamming"))

    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    write("ann_ivf_topk", ivfTopK(vecs).toDF("query_id", "rank", "neighbor_id", "cos"))
  }
}

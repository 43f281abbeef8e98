package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.CrawlConfig
import graft.corpus.{CorpusGen, CorpusTable}
import graft.frontier.SnapshotStore
import graft.operators._
import graft.round.CrawlEngine

/** Driver contract (see SURVEY.md §7.5): one `queries` entry per operator
  * family from SURVEY.md §2 plus the training-data pipeline operators
  * (dedup / similarity / text analysis / multimodal), with a DuckDB-
  * runnable ANSI-SQL oracle for every SQL-expressible one. Column names and
  * types are aligned pairwise — the driver sorts columns by name and hashes
  * values, so every computed column is aliased identically on both sides.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Crawl-engine E2E on the deterministic synthetic corpus; memoized per
    * JVM so the two crawl queries share one run. Public: ExpectedOracles
    * runs the reference simulator on the same spec + cfg. */
  val crawlSpec = CorpusGen.Spec(nHosts = 6, pagesPerHost = 18)
  val crawlCfg = CrawlConfig(hostBudgetPerRound = 2, roundBudget = 16, maxRounds = 30,
    // A5: three registered fetch resources so the least-used rotation is
    // observable in the resource_used oracle
    resources = Seq("tor-0", "tor-1", "tor-2"))
  @volatile private var crawlStateDir: Option[String] = None
  private def crawlState(s: SparkSession): String = synchronized {
    crawlStateDir.getOrElse {
      val dir = java.nio.file.Files.createTempDirectory("graft-entry-crawl").toString
      val store = new SnapshotStore(dir, s)
      CrawlEngine.crawl(s, store, CorpusTable.create(s, crawlSpec),
        CorpusGen.seeds(crawlSpec), crawlCfg)
      crawlStateDir = Some(dir)
      dir
    }
  }

  /** Pool-breaker + write-back scenario: a denser corpus whose xx-io / xx-gen
    * pages are actually reached, two registered resources with
    * maxResourceFailures=3 (proxy-a closes mid-crawl, proxy-b keeps
    * crawling alone, then the pool exhausts → NoResourcesAvailable stop),
    * and the A12 FrontierWriteBackSink merging extractedText into the
    * frontier's `source` column inside each commit. Oracled against the
    * reference simulator run with the identical spec + cfg. */
  val breakerSpec = CorpusGen.Spec(nHosts = 3, pagesPerHost = 40)
  val breakerCfg = CrawlConfig(hostBudgetPerRound = 6, roundBudget = 14, maxRounds = 60,
    politenessCenterTicks = 0, politenessRadiusTicks = 0,
    resources = Seq("proxy-a", "proxy-b"), maxResourceFailures = 3)
  @volatile private var breakerStateDir: Option[String] = None
  private def breakerState(s: SparkSession): String = synchronized {
    breakerStateDir.getOrElse {
      val dir = java.nio.file.Files.createTempDirectory("graft-entry-breaker").toString
      val store = new SnapshotStore(dir, s)
      CrawlEngine.crawl(s, store, CorpusTable.create(s, breakerSpec),
        CorpusGen.seeds(breakerSpec), breakerCfg,
        graft.round.PipelineHooks(parsedSinks = Seq(graft.round.FrontierWriteBackSink)))
      breakerStateDir = Some(dir)
      dir
    }
  }

  /** Flagship: the crawl engine's full fetch schedule (rows>0 smoke). */
  def entry(spark: SparkSession): DataFrame = {
    val store = new SnapshotStore(crawlState(spark), spark)
    store.allResults().get.orderBy(col("round"), col("seq"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.A/B scans, predicates, limits --------------------------------
    "lease_scan" -> ((s, d) => CrawlOps.leaseScan(t(s, d, "events"))),
    "lease_expiry" -> ((s, d) => CrawlOps.leaseExpiry(t(s, d, "events"))),
    "lease_scan_by_type" -> ((s, d) => CrawlOps.leaseScanByType(t(s, d, "events"))),
    "scan_pushdown" -> ((s, d) => CrawlOps.scanPushdown(t(s, d, "lineitem"))),
    // ---- §2.C joins ------------------------------------------------------
    "dim_join_report" -> ((s, d) =>
      CrawlOps.dimJoinReport(t(s, d, "events"), t(s, d, "customer"), t(s, d, "nation"))),
    "seen_anti_join" -> ((s, d) =>
      CrawlOps.seenAntiJoin(t(s, d, "events"), t(s, d, "customer"))),
    "seen_bloom_probe" -> ((s, d) =>
      CrawlOps.seenBloomProbe(t(s, d, "events"), t(s, d, "customer"))),
    "topk_revenue" -> ((s, d) =>
      CrawlOps.revenueByNation(t(s, d, "customer"), t(s, d, "orders"),
        t(s, d, "lineitem"), t(s, d, "nation"))),
    // ---- §2.D aggregations ----------------------------------------------
    "outcome_report" -> ((s, d) => CrawlOps.outcomeReport(t(s, d, "events"))),
    "salted_agg" -> ((s, d) => CrawlOps.saltedAgg(t(s, d, "events"))),
    "distinct_users" -> ((s, d) => CrawlOps.distinctUsers(t(s, d, "events"))),
    "q1_pricing" -> ((s, d) => CrawlOps.pricingSummary(t(s, d, "lineitem"))),
    // ---- §2.E windows / ranking -----------------------------------------
    "window_dedup_keepmax" -> ((s, d) => CrawlOps.windowDedupKeepMax(t(s, d, "events"))),
    "perhost_rank" -> ((s, d) => CrawlOps.perHostRank(t(s, d, "events"))),
    "global_cut_topk" -> ((s, d) => CrawlOps.globalCutTopK(t(s, d, "events"))),
    // ---- §2.F/G politeness + retry --------------------------------------
    "politeness_schedule" -> ((s, d) => CrawlOps.politenessSchedule(t(s, d, "events"))),
    "retry_split" -> ((s, d) => CrawlOps.retrySplit(t(s, d, "events"))),
    // ---- §2.J streaming-shaped (batch twins) ----------------------------
    "window_counts" -> ((s, d) => CrawlOps.windowCounts(t(s, d, "events"))),
    "sessionize" -> ((s, d) => CrawlOps.sessionize(t(s, d, "events"))),
    "sessionize_window" -> ((s, d) => CrawlOps.sessionizeWindow(t(s, d, "events"))),
    // ---- dedup family ----------------------------------------------------
    "dedup_exact" -> ((s, d) => Dedup.exact(t(s, d, "documents")).orderBy(col("fp"))),
    "dedup_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccard(t(s, d, "documents")).orderBy(col("doc_a"), col("doc_b"))),
    "dedup_minhash_lsh" -> ((s, d) =>
      Dedup.minhashLsh(t(s, d, "documents")).orderBy(col("doc_a"), col("doc_b"))),
    "dedup_simhash" -> ((s, d) =>
      Dedup.simhashPairs(t(s, d, "documents"), maxHamming = 3)
        .orderBy(col("doc_a"), col("doc_b"))),
    // cluster resolution over the LSH pair graph (LSH ≡ exact pairs here,
    // proven by the dedup_minhash_lsh oracle) — survivor = min doc_id
    "dedup_components" -> ((s, d) =>
      Dedup.connectedComponents(Dedup.minhashLsh(t(s, d, "documents")))
        .orderBy(col("doc_id"))),
    "dedup_embedding_cos" -> ((s, d) =>
      Similarity.cosineNearDup(t(s, d, "embeddings")).orderBy(col("vec_a"), col("vec_b"))),
    "dedup_embedding_rplsh" -> ((s, d) =>
      Similarity.rpLshNearDup(t(s, d, "embeddings")).orderBy(col("vec_a"), col("vec_b"))),
    // ---- similarity search ----------------------------------------------
    "ann_brute_topk" -> ((s, d) =>
      Similarity.bruteForceTopK(t(s, d, "embeddings")).orderBy(col("query_id"), col("rank"))),
    "ann_ivf_topk" -> ((s, d) =>
      Similarity.ivfTopK(t(s, d, "embeddings")).orderBy(col("query_id"), col("rank"))),
    // ---- text analysis ---------------------------------------------------
    "text_langid" -> ((s, d) => TextAnalysis.langId(t(s, d, "documents"))),
    "text_quality" -> ((s, d) => TextAnalysis.quality(t(s, d, "documents"))),
    "text_token_count" -> ((s, d) => TextAnalysis.tokenCounts(t(s, d, "documents"))),
    "text_fingerprint" -> ((s, d) => TextAnalysis.fingerprints(t(s, d, "documents"))),
    // ---- multimodal plumbing --------------------------------------------
    "multimodal_meta" -> ((s, d) =>
      Multimodal.metaTable(t(s, d, "documents")).orderBy(col("doc_id"))),
    // ---- crawl engine E2E (simulator-verified; no SQL oracle) -----------
    "crawl_fetch_schedule" -> ((s, _) => entry(s)),
    "crawl_frontier_final" -> ((s, _) => {
      val store = new SnapshotStore(crawlState(s), s)
      store.readFrontier(store.latestVersion.get)
        .select(col("id"), col("urlNorm"), col("host"), col("status"),
          col("attempt"), col("priority"))
        .orderBy(col("id"))
    }),
    // ---- §2.A5 least-used resource accounting (simulator-verified) ------
    "resource_used" -> ((s, _) =>
      CrawlEngine.resourceLog(s, new SnapshotStore(crawlState(s), s))
        .orderBy(col("round"))),
    // ---- pool-level failure breaker (simulator-verified): proxy-a closes
    // at maxResourceFailures, proxy-b serves the remaining rounds alone ---
    "resource_breaker" -> ((s, _) =>
      CrawlEngine.resourceLog(s, new SnapshotStore(breakerState(s), s))
        .orderBy(col("round"))),
    // ---- §2.A12 write-back parsed sink: extractedText merged onto the
    // frontier row (`source`) in the same commit (simulator-verified) -----
    "frontier_writeback" -> ((s, _) => {
      val store = new SnapshotStore(breakerState(s), s)
      store.readFrontier(store.latestVersion.get)
        .select(col("id"), col("urlNorm"), col("status"), col("source"))
        .orderBy(col("id"))
    })
  )

  // Shared SQL fragments (kept in sync with graft.functions.TextFunctions)
  private val SqlToks =
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')"
  private val SqlLexEn = "['the','a','an','and','or','of','to','in','is','it','for','on','with','as','at','by']"
  private val SqlLexDe = "['der','die','das','und','ist','nicht','ein','mit','von','zu']"
  private val SqlLexFr = "['le','la','les','et','est','un','une','des','du','pour']"
  private val SqlLexEs = "['el','los','las','y','es','un','una','de','que','por']"
  private val SqlFp = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"

  // shared CTE block ending in `jp` = thresholded Jaccard pairs — reused by
  // the pair oracles and the connected-components closure below
  private val SqlJaccardCtes =
    s"""d AS (SELECT doc_id, $SqlToks AS toks FROM documents),
       |s AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks)-1),
       |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS sh
       |      FROM d WHERE len(toks) >= 3),
       |sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY 1),
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1,2),
       |jp AS (SELECT doc_a, doc_b,
       |         round(inter::DOUBLE/(x.n + y.n - inter), 4) AS jaccard
       |       FROM p JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
       |       WHERE round(inter::DOUBLE/(x.n + y.n - inter), 4) >= 0.8)""".stripMargin

  private val SqlJaccardPairs =
    s"""WITH $SqlJaccardCtes
       |SELECT doc_a, doc_b, jaccard FROM jp ORDER BY doc_a, doc_b""".stripMargin

  // transitive closure of the (symmetric) pair graph via a recursive CTE:
  // DuckDB's UNION-recursion reaches a fixpoint on cyclic graphs, and
  // comp(x) = least(x, min reachable) is exactly the min-id component
  private val SqlComponents =
    s"""WITH RECURSIVE $SqlJaccardCtes,
       |e AS (SELECT doc_a AS u, doc_b AS v FROM jp
       |      UNION SELECT doc_b, doc_a FROM jp),
       |reach(u, v) AS (
       |  SELECT u, v FROM e
       |  UNION
       |  SELECT r.u, e2.v FROM reach r JOIN e e2 ON r.v = e2.u)
       |SELECT CAST(u AS BIGINT) AS doc_id,
       |       CAST(least(u, min(v)) AS BIGINT) AS component_id,
       |       CAST(least(u, min(v)) AS BIGINT) AS keep_id
       |FROM reach GROUP BY u ORDER BY doc_id""".stripMargin

  private val SqlAntiJoin =
    """SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events
      |WHERE user_id NOT IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "lease_scan" ->
      """SELECT event_id, user_id, value FROM events WHERE event_type = 'click'
        |ORDER BY event_id LIMIT 100""".stripMargin,
    "lease_scan_by_type" ->
      """SELECT event_type, CAST(rn AS INTEGER) AS rn, event_id, user_id FROM (
        |  SELECT event_type, event_id, user_id,
        |    row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS rn
        |  FROM events)
        |WHERE rn <= 50 ORDER BY event_type, rn""".stripMargin,
    "lease_expiry" ->
      """SELECT event_id,
        |  CASE WHEN ts <= TIMESTAMP '2024-01-15 00:00:00' THEN 'taskWait'
        |       ELSE 'taskInProgress' END AS status
        |FROM events WHERE event_type = 'view' ORDER BY event_id""".stripMargin,
    "scan_pushdown" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "dim_join_report" ->
      """SELECT n_name, CAST(count(*) AS BIGINT) AS n_events,
        |  round(CAST(sum(value) AS DOUBLE), 2) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "seen_anti_join" -> SqlAntiJoin,
    "seen_bloom_probe" -> SqlAntiJoin,
    "topk_revenue" ->
      """SELECT n_name,
        |  round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY revenue DESC, n_name LIMIT 5""".stripMargin,
    "outcome_report" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(sum(value) AS DOUBLE), 2) AS sum_value,
        |  round(avg(value), 4) AS avg_value,
        |  round(min(value), 2) AS min_value,
        |  round(max(value), 2) AS max_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "salted_agg" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(sum(value) AS DOUBLE), 2) AS sum_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "distinct_users" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty,
        |  round(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS sum_base_price,
        |  round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "window_dedup_keepmax" ->
      """SELECT event_id, user_id, event_type FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id DESC) = 1
        |ORDER BY event_id""".stripMargin,
    "perhost_rank" ->
      """SELECT user_id, CAST(rn AS INTEGER) AS rn, event_id, value FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn
        |  FROM events WHERE event_type = 'click')
        |WHERE rn <= 2 ORDER BY user_id, rn""".stripMargin,
    "global_cut_topk" ->
      """SELECT CAST(row_number() OVER (ORDER BY value DESC, event_id ASC) AS INTEGER) AS seq,
        |  event_id, value
        |FROM (SELECT event_id, value FROM events ORDER BY value DESC, event_id ASC LIMIT 100)
        |ORDER BY seq""".stripMargin,
    "retry_split" ->
      """SELECT event_id, attempt,
        |  CASE WHEN attempt + 1 >= 3 THEN 'taskFailed' ELSE 'taskWait' END AS new_status,
        |  CASE WHEN attempt + 1 >= 3 THEN attempt ELSE attempt + 1 END AS new_attempt
        |FROM (SELECT event_id, CAST(props->>'k' AS INTEGER) % 4 AS attempt
        |      FROM events WHERE event_type = 'error')
        |ORDER BY event_id""".stripMargin,
    "window_counts" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(sum(value) AS DOUBLE), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "sessionize" ->
      """WITH t AS (
        |  SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN prev_ts IS NULL
        |           OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM t),
        |x AS (
        |  SELECT user_id, ts,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM s)
        |SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end
        |FROM x GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
    "dedup_exact" ->
      s"""SELECT $SqlFp AS fp, CAST(min(doc_id) AS BIGINT) AS keep_id,
         |  CAST(count(*) AS BIGINT) AS n_docs
         |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_ngram_jaccard" -> SqlJaccardPairs,
    "dedup_minhash_lsh" -> SqlJaccardPairs,
    "dedup_components" -> SqlComponents,
    "sessionize_window" ->
      """WITH t AS (
        |  SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN prev_ts IS NULL
        |           OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM t),
        |x AS (
        |  SELECT user_id, ts,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM s)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM x GROUP BY user_id, session_id ORDER BY user_id, session_start""".stripMargin,
    "dedup_embedding_rplsh" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM e)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i]))
        |        / (a.nrm*b.nrm), 4) AS cos
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE round(list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i]))
        |        / (a.nrm*b.nrm), 4) >= 0.5
        |ORDER BY vec_a, vec_b""".stripMargin,
    "dedup_embedding_cos" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM e)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i]))
        |        / (a.nrm*b.nrm), 4) AS cos
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE round(list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i]))
        |        / (a.nrm*b.nrm), 4) >= 0.45
        |ORDER BY vec_a, vec_b""".stripMargin,
    "ann_brute_topk" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM e),
        |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 8),
        |sc AS (
        |  SELECT q.query_id, n.vec_id AS neighbor_id,
        |    round(list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*n.v[i]))
        |          / (qn*n.nrm), 4) AS cos
        |  FROM q JOIN n ON n.vec_id <> q.query_id)
        |SELECT query_id,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC)
        |       AS INTEGER) AS rank,
        |  neighbor_id, cos
        |FROM sc
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) <= 10
        |ORDER BY query_id, rank""".stripMargin,
    "text_langid" ->
      s"""WITH d AS (SELECT doc_id, text, $SqlToks AS toks FROM documents),
         |sc AS (SELECT doc_id,
         |  len(list_filter(toks, t -> list_contains($SqlLexEn, t))) AS score_en,
         |  len(list_filter(toks, t -> list_contains($SqlLexDe, t))) AS score_de,
         |  len(list_filter(toks, t -> list_contains($SqlLexFr, t))) AS score_fr,
         |  len(list_filter(toks, t -> list_contains($SqlLexEs, t))) AS score_es,
         |  len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS score_zh
         |FROM d)
         |SELECT doc_id,
         |  CASE WHEN score_en = best AND best > 0 THEN 'en'
         |       WHEN score_de = best AND best > 0 THEN 'de'
         |       WHEN score_fr = best AND best > 0 THEN 'fr'
         |       WHEN score_es = best AND best > 0 THEN 'es'
         |       WHEN score_zh = best AND best > 0 THEN 'zh'
         |       ELSE 'und' END AS lang_pred,
         |  score_en, score_de, score_fr, score_es, score_zh
         |FROM (SELECT *, greatest(score_en, score_de, score_fr, score_es, score_zh) AS best
         |      FROM sc)
         |ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      s"""WITH d AS (SELECT doc_id, text, $SqlToks AS toks FROM documents),
         |f AS (SELECT doc_id,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  round(len(list_filter(toks, t -> list_contains($SqlLexEn, t)))::DOUBLE
         |        / greatest(len(toks), 1), 4) AS stopword_ratio,
         |  round(len(regexp_extract_all(text, '[.!?,;:]'))::DOUBLE
         |        / greatest(length(text), 1), 4) AS punct_ratio,
         |  round(list_sum(list_transform(toks, t -> length(t)))::DOUBLE
         |        / greatest(len(toks), 1), 4) AS avg_token_len
         |FROM d)
         |SELECT doc_id, n_tokens, n_chars, stopword_ratio, punct_ratio, avg_token_len,
         |  round((CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1.0
         |              WHEN n_tokens >= 5 THEN 0.5 ELSE 0.0 END) * 0.5
         |        + (CASE WHEN stopword_ratio > 0.01 THEN 0.25 ELSE 0.0 END)
         |        + (CASE WHEN punct_ratio < 0.2 THEN 0.25 ELSE 0.0 END), 4) AS quality
         |FROM f ORDER BY doc_id""".stripMargin,
    "text_token_count" ->
      s"""SELECT doc_id, CAST(len($SqlToks) AS BIGINT) AS n_word_tokens,
         |  CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]')) AS BIGINT)
         |    AS n_bpeish_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      s"SELECT doc_id, $SqlFp AS fp FROM documents ORDER BY doc_id",
    // ---- expected-oracle tables (computed by the reference simulator /
    // pure driver-side Scala in ExpectedOracles, persisted by Verify as
    // parquet BEFORE this map is dumped; DuckDB reads them by absolute
    // path — see ExpectedOracles scaladoc) --------------------------------
    "crawl_fetch_schedule" -> ExpectedOracles.sqlFor("crawl_fetch_schedule"),
    "crawl_frontier_final" -> ExpectedOracles.sqlFor("crawl_frontier_final"),
    "resource_used" -> ExpectedOracles.sqlFor("resource_used"),
    "resource_breaker" -> ExpectedOracles.sqlFor("resource_breaker"),
    "frontier_writeback" -> ExpectedOracles.sqlFor("frontier_writeback"),
    "politeness_schedule" -> ExpectedOracles.sqlFor("politeness_schedule"),
    "dedup_simhash" -> ExpectedOracles.sqlFor("dedup_simhash"),
    "ann_ivf_topk" -> ExpectedOracles.sqlFor("ann_ivf_topk"),
    "multimodal_meta" ->
      """SELECT doc_id, n AS n_bytes,
        |  CASE WHEN n % 3 = 0 THEN 'image' WHEN n % 3 = 1 THEN 'audio'
        |       ELSE 'video' END AS media_type,
        |  CAST(64 + n % 192 AS INTEGER) AS width,
        |  CAST(64 + (n * 7) % 192 AS INTEGER) AS height,
        |  CAST(1 + n % 7 AS INTEGER) AS n_frames,
        |  md5(text) AS checksum_hex
        |FROM (SELECT doc_id, text, CAST(strlen(text) AS BIGINT) AS n FROM documents)
        |ORDER BY doc_id""".stripMargin
  )
}

package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Det

/** Spark materialization of [[CorpusGen]] — the Common-Crawl-style page
  * table (url, warc_ts, html, text, lang) per BASELINE.json input_hint.
  *
  * Small specs build driver-side; large (bench) specs generate distributed
  * from `spark.range` so a 10^6-row corpus never sits on the driver.
  */
object CorpusTable {

  /** Driver-side build (test scale). */
  def create(spark: SparkSession, spec: CorpusGen.Spec): DataFrame = {
    import spark.implicits._
    CorpusGen.rows(spec)
      .map(r => (r.url, new java.sql.Timestamp(r.warcTsMicros / 1000), CorpusGen.htmlBytes(r), r.text, r.lang))
      .toDF("url", "warc_ts", "html", "text", "lang")
  }

  /** Distributed build for bench scale: one flat page universe,
    * `nHosts` hosts with Zipf-ish page counts via modular striping (host
    * h = i % nHosts gets every nHosts-th page id — uniform; skew comes from
    * hashing a share of rows onto host 0). Deterministic, seed-free of
    * wall-clock. */
  def createLarge(spark: SparkSession, nPages: Long, nHosts: Int, skewPct: Int = 20,
                  textRepeat: Int = 1): DataFrame = {
    import spark.implicits._
    val pages = spark.range(nPages)
      .select(
        col("id"),
        // skewPct% of pages pile onto host0 (heavy-host skew), rest striped
        when(pmod(xxhash64(col("id")), lit(100)) < skewPct, lit(0))
          .otherwise(pmod(col("id"), lit(nHosts.toLong)).cast("int")).as("h"))
      .select(col("id"), col("h"),
        concat(lit("https://host"), col("h"), lit(".example/p"), col("id")).as("url"),
        timestamp_micros(lit(1767225600000000L) + pmod(xxhash64(col("id"), lit(7)), lit(86400000000L))).as("warc_ts"),
        // textRepeat scales the body toward realistic page sizes (the
        // default tiny body under-weights per-row parse/IO work)
        repeat(concat(lit("text for page "), col("id"), lit(" on host "), col("h"),
          lit(" words "), pmod(xxhash64(col("id"), lit(11)), lit(1000)), lit(" ")),
          math.max(textRepeat, 1)).as("text"),
        element_at(lit(Array("en", "ru", "de")), (pmod(col("id"), lit(3)) + 1).cast("int")).as("lang"))
    pages.select(
      col("url"), col("warc_ts"),
      // html = synth template rendered by expression (keeps generation
      // codegen'd, no UDF): matches HtmlCodec.synth for plain text/no links
      concat(lit("<html><head><title>p"), col("id"), lit("</title></head><body><article>"),
        col("text"), lit("</article><nav>"),
        lit("<a href=\"/p"), pmod(col("id") + 1, lit(nPages)), lit("\">l</a>"),
        lit("</nav></body></html>")).cast("binary").as("html"),
      col("text"), col("lang"))
  }

  def write(spark: SparkSession, spec: CorpusGen.Spec, path: String): Unit =
    create(spark, spec).write.mode("overwrite").parquet(path)
}

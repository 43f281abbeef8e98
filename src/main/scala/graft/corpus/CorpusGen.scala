package graft.corpus

import java.nio.charset.StandardCharsets
import graft.core.{Det, HtmlCodec, UrlNormalizer}
import graft.sim.ReferenceSimulator.SimPage

/** Deterministic synthetic Common-Crawl-style corpus
  * (BASELINE.json input_hint shape: url, warc_ts, html, text, lang).
  *
  * Pure row generator — the same rows feed the in-memory simulator (as a
  * Map) and Spark (as a Dataset via [[graft.corpus.CorpusTable]]). Html is
  * rendered from text with [[HtmlCodec.synth]], so extraction is provably
  * byte-identical (FIXTURES.md F1). Per-host page counts are Zipf-skewed and
  * host 0 is pathologically heavy to exercise the salted-rank path at scale.
  *
  * Failure-mode rows (drive the reference outcome taxonomy,
  * `ResourceHelper.scala:10-28`):
  *  - every page whose pageIdx % 37 == 13 → lang "xx-ban"   (BotBanned)
  *  - pageIdx % 37 == 17 → lang "xx-io2"  (IOException until round 2)
  *  - pageIdx % 37 == 21 → lang "xx-gen"  (generic failure → retry/cap)
  *  - pageIdx % 37 == 25 → malformed html (ParsingException)
  *  - links to "/missing..." have no corpus row (PageNotFound)
  *  - each host serves /robots.txt disallowing /private; pageIdx % 37 == 29
  *    pages live under /private (never crawled)
  */
object CorpusGen {

  final case class Spec(
      nHosts: Int = 8,
      pagesPerHost: Int = 24, // host h gets ~pagesPerHost / (1+h) pages (Zipf)
      heavyHostFactor: Int = 4, // host0 extra weight
      baseTsMicros: Long = 1767225600000000L, // 2026-01-01T00:00:00Z
      seed: Long = 42L)

  def host(spec: Spec, h: Int): String = s"host$h.example"

  def pagesForHost(spec: Spec, h: Int): Int = {
    val base = math.max(2, spec.pagesPerHost / (1 + h))
    if (h == 0) base * spec.heavyHostFactor else base
  }

  /** Deterministic pseudo-text: a few sentences seeded by (host, idx).
    * ~5% of pages duplicate the text of an earlier page (exact-dup rows for
    * the dedup operators). */
  def textFor(spec: Spec, h: Int, i: Int): String = {
    val dup = Det.pmod(Det.xxhash64(s"dup:$h:$i", spec.seed), 20) == 7 && i > 1
    val (sh, si) = if (dup) (h, 1) else (h, i)
    val words = Vector("web", "crawl", "frontier", "spark", "parquet", "shard",
      "queue", "lease", "politeness", "robots", "anchor", "index", "page",
      "data", "graph", "link", "host", "fetch", "parse", "text")
    val n = 12 + Det.pmod(Det.xxhash64(s"len:$sh:$si", spec.seed), 30).toInt
    val sb = new StringBuilder
    var k = 0
    while (k < n) {
      val w = words(Det.pmod(Det.xxhash64(s"w:$sh:$si:$k", spec.seed), words.size).toInt)
      if (k > 0) sb.append(if (k % 8 == 0) ". " else " ")
      sb.append(w)
      k += 1
    }
    sb.append(".").toString
  }

  def urlFor(spec: Spec, h: Int, i: Int): String = {
    val priv = i % 37 == 29
    if (priv) s"https://${host(spec, h)}/private/p$i"
    else s"https://${host(spec, h)}/p$i"
  }

  /** Outbound raw hrefs for page (h, i): relative next-page, an absolute
    * same-host link, a dup, an off-host link (filtered by the reference
    * predicate), a missing page, and occasionally a messy-needs-normalizing
    * form. Document order fixed. */
  def linksFor(spec: Spec, h: Int, i: Int): Seq[String] = {
    val np = pagesForHost(spec, h)
    val hn = host(spec, h)
    val b = Seq.newBuilder[String]
    b += s"/p${(i + 1) % np}"
    b += s"https://$hn/p${(i * 2 + 1) % np}"
    b += s"/p${(i + 1) % np}" // duplicate link
    b += s"https://host${(h + 1) % spec.nHosts}.example/p0" // off-host: dropped by B8
    if (i % 11 == 3) b += s"/missing$i" // PageNotFound path
    if (i % 13 == 5) b += s"HTTPS://${hn.toUpperCase}:443/p${(i + 3) % np}/../p${(i + 2) % np}#frag"
    if (i % 17 == 7) b += s"/private/p${(i % 37) / 37 * 37 + 29}" // robots-blocked target
    b.result()
  }

  def langFor(h: Int, i: Int): String = i % 37 match {
    case 13 => "xx-ban"
    case 17 => "xx-io2"
    case 21 => "xx-gen"
    case _  => Vector("en", "ru", "de")((h + i) % 3)
  }

  final case class Row(url: String, warcTsMicros: Long, html: String, text: String, lang: String)

  /** All corpus rows, normalized-url keyed, deterministic order. */
  def rows(spec: Spec): Vector[Row] = {
    val out = Vector.newBuilder[Row]
    var h = 0
    while (h < spec.nHosts) {
      val hn = host(spec, h)
      // robots.txt page: text IS the robots body
      val robotsBody = s"User-agent: *\nDisallow: /private\nCrawl-delay: ${h % 3}\n"
      out += Row(s"https://$hn/robots.txt", spec.baseTsMicros,
        HtmlCodec.synth("robots", robotsBody, Nil), robotsBody, "en")
      val np = pagesForHost(spec, h)
      var i = 0
      while (i < np) {
        val url = urlFor(spec, h, i)
        val text = textFor(spec, h, i)
        val title = s"page $h/$i"
        val links = linksFor(spec, h, i)
        val html =
          if (i % 37 == 25) "<html><body><article>never closed " + HtmlCodec.escape(text)
          else HtmlCodec.synth(title, text, links)
        // millisecond-aligned so a round-trip through java.sql.Timestamp
        // (ms precision) is lossless — ranking keys must match the simulator
        val ts = spec.baseTsMicros +
          Det.pmod(Det.xxhash64(s"ts:$h:$i", spec.seed), 86400000L) * 1000L
        out += Row(url, ts, html, text, langFor(h, i))
        i += 1
      }
      h += 1
    }
    out.result()
  }

  /** Simulator view: normalized-url → page. */
  def simCorpus(spec: Spec): Map[String, SimPage] =
    rows(spec).map { r =>
      val n = UrlNormalizer.normalize(r.url).get
      n -> SimPage(n, r.warcTsMicros, r.html, r.text, r.lang)
    }.toMap

  /** Default seed list: one high-priority seed on the heavy host plus one
    * per other host, in seed order. */
  def seeds(spec: Spec): Seq[(String, Int)] =
    (0 until spec.nHosts).map { h =>
      // messy on purpose: normalizes to https://host$h.example/p0
      (s"HTTPS://Host$h.Example:443/x/../p0#top", if (h == 0) 5 else spec.nHosts - h)
    }

  def htmlBytes(r: Row): Array[Byte] = r.html.getBytes(StandardCharsets.UTF_8)
}

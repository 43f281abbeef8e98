package graft.core

import java.util.Locale

/** RFC 3986 URL normalization + SURT host reversal.
  *
  * The reference pushes raw `href` strings into its queue without any
  * canonicalization (`simple-worker/.../HabrParser.scala:27` — relative links
  * are never resolved, a reference deficiency documented in SURVEY.md §2.H H4).
  * The north rule adds proper canonicalization; this is it. Pure Scala, no
  * Spark dependency, so the reference simulator and the Spark UDF share one
  * implementation (determinism requirement, SURVEY.md §7.4 risk 1).
  *
  * Normalization rules (idempotent — property-tested):
  *  - lowercase scheme and host
  *  - strip default ports (http:80, https:443)
  *  - drop the fragment
  *  - resolve dot-segments (`/a/../b` → `/b`)
  *  - percent-decode unreserved characters, uppercase remaining triplets
  *  - empty path → "/"
  *  - sort query parameters (stable: by key, then value; duplicates kept)
  *  - strip empty query ("?" alone)
  */
object UrlNormalizer {

  final case class ParsedUrl(
      scheme: String,
      host: String,
      port: Int, // -1 = none/default
      path: String,
      query: Option[String]
  ) {
    def render: String = {
      val p = if (port >= 0) s":$port" else ""
      val q = query.map("?" + _).getOrElse("")
      s"$scheme://$host$p$path$q"
    }
  }

  private val SchemeRe = "^([a-zA-Z][a-zA-Z0-9+.-]*):(.*)$".r

  /** Parse an absolute URL. Returns None for anything unfetchable
    * (mailto:, javascript:, missing host, non-http(s) scheme). */
  def parse(url: String): Option[ParsedUrl] = url.trim match {
    case SchemeRe(scheme, rest) =>
      val sch = scheme.toLowerCase(Locale.ROOT)
      if (sch != "http" && sch != "https") None
      else if (!rest.startsWith("//")) None
      else {
        val afterSlashes = rest.drop(2)
        // authority ends at first of / ? #
        val authEnd = afterSlashes.indexWhere(c => c == '/' || c == '?' || c == '#')
        val (auth, tail) =
          if (authEnd < 0) (afterSlashes, "")
          else (afterSlashes.take(authEnd), afterSlashes.drop(authEnd))
        // strip userinfo
        val hostPort = auth.lastIndexOf('@') match {
          case -1 => auth
          case i  => auth.drop(i + 1)
        }
        val (host, port) = hostPort.lastIndexOf(':') match {
          case -1 => (hostPort, -1)
          case i =>
            val ps = hostPort.drop(i + 1)
            if (ps.forall(_.isDigit) && ps.nonEmpty)
              (hostPort.take(i), ps.toInt)
            else (hostPort, -1)
        }
        if (host.isEmpty) None
        else {
          // split tail into path / query, dropping fragment
          val noFrag = tail.indexOf('#') match {
            case -1 => tail
            case i  => tail.take(i)
          }
          val (path, query) = noFrag.indexOf('?') match {
            case -1 => (noFrag, None)
            case i  => (noFrag.take(i), Some(noFrag.drop(i + 1)))
          }
          Some(ParsedUrl(sch, host.toLowerCase(Locale.ROOT), port, path, query))
        }
      }
    case _ => None
  }

  private def isUnreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Percent-decode unreserved chars; uppercase remaining %XX triplets. */
  def normalizePercent(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          hexVal(s.charAt(i + 1)) >= 0 && hexVal(s.charAt(i + 2)) >= 0) {
        val v = hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2))
        val dc = v.toChar
        if (v < 128 && isUnreserved(dc)) sb.append(dc)
        else {
          sb.append('%')
          sb.append(Character.toUpperCase(s.charAt(i + 1)))
          sb.append(Character.toUpperCase(s.charAt(i + 2)))
        }
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  def removeDotSegments(path: String): String = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.drop(3)
      else if (in.startsWith("./")) in = in.drop(2)
      else if (in.startsWith("/./")) in = "/" + in.drop(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.drop(4); if (out.nonEmpty) out.remove(out.size - 1) }
      else if (in == "/..") { in = "/"; if (out.nonEmpty) out.remove(out.size - 1) }
      else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.startsWith("/")) 1 else 0
        val next = in.indexOf('/', start)
        val seg = if (next < 0) in else in.take(next)
        out += seg
        in = if (next < 0) "" else in.drop(seg.length)
      }
    }
    out.mkString
  }

  private def sortQuery(q: String): Option[String] = {
    if (q.isEmpty) None
    else {
      val parts = q.split("&", -1).filter(_.nonEmpty)
      if (parts.isEmpty) None
      else {
        val sorted = parts.sortWith { (a, b) =>
          val ak = a.takeWhile(_ != '='); val bk = b.takeWhile(_ != '=')
          if (ak != bk) ak < bk else a < b
        }
        Some(sorted.mkString("&"))
      }
    }
  }

  /** Full normalization of an absolute URL. None ⇒ unfetchable. */
  def normalize(url: String): Option[String] = parse(url).map { p =>
    val port =
      if (p.port == 80 && p.scheme == "http") -1
      else if (p.port == 443 && p.scheme == "https") -1
      else p.port
    val rawPath = if (p.path.isEmpty) "/" else p.path
    val path = removeDotSegments(normalizePercent(rawPath)) match {
      case "" => "/"
      case s if !s.startsWith("/") => "/" + s
      case s => s
    }
    val query = p.query.map(normalizePercent).flatMap(sortQuery)
    ParsedUrl(p.scheme, p.host, port, path, query).render
  }

  /** Resolve a (possibly relative) href against a base URL, then normalize.
    * RFC 3986 §5.2 merge, restricted to the forms a crawler meets. */
  def resolve(base: String, href: String): Option[String] = {
    val h = href.trim
    if (h.isEmpty) None
    else if (SchemeRe.findFirstIn(h).isDefined) normalize(h)
    else parse(base).flatMap { b =>
      if (h.startsWith("//")) normalize(s"${b.scheme}:$h")
      else {
        val portS = if (b.port >= 0) s":${b.port}" else ""
        val origin = s"${b.scheme}://${b.host}$portS"
        if (h.startsWith("/")) normalize(origin + h)
        else if (h.startsWith("?")) {
          val basePath = if (b.path.isEmpty) "/" else b.path
          normalize(origin + basePath + h)
        } else if (h.startsWith("#")) None // same-document reference
        else {
          // relative path: merge with base dir
          val basePath = if (b.path.isEmpty) "/" else b.path
          val dir = basePath.take(basePath.lastIndexOf('/') + 1)
          normalize(origin + dir + h)
        }
      }
    }
  }

  /** Host of a normalized (or raw) URL; empty string if unparseable. */
  def hostOf(url: String): String = parse(url).map(_.host).getOrElse("")

  /** SURT-style host reversal: "www.example.com" → "com,example,www". */
  def surtHost(host: String): String =
    host.toLowerCase(Locale.ROOT).split('.').reverse.mkString(",")

  /** Path (+ sorted query) portion of a URL, for robots matching. */
  def pathOf(url: String): String = parse(url) match {
    case Some(p) =>
      val path = if (p.path.isEmpty) "/" else p.path
      path + p.query.map("?" + _).getOrElse("")
    case None => "/"
  }
}

package graft.core

import org.scalatest.funsuite.AnyFunSuite

class RobotsSpec extends AnyFunSuite {
  import Robots._

  val body =
    """# comment
      |User-agent: googlebot
      |Disallow: /google-only
      |
      |User-agent: *
      |Disallow: /private
      |Disallow: /tmp/*.bak
      |Allow: /private/ok
      |Crawl-delay: 2.5
      |
      |User-agent: *
      |Disallow: /also
      |""".stripMargin

  test("parses star groups only, merging multiple") {
    val r = parse(body)
    assert(r.disallow == Vector("/private", "/tmp/*.bak", "/also"))
    assert(r.allow == Vector("/private/ok"))
    assert(r.crawlDelay == Some(2.5))
  }

  test("longest-match wins; tie goes to allow") {
    val r = parse(body)
    assert(!allowed(r, "/private/x"))
    assert(allowed(r, "/private/ok/y")) // allow rule longer
    assert(allowed(r, "/public"))
    assert(!allowed(r, "/also/x"))
  }

  test("wildcards and anchors") {
    val r = Rules(Vector.empty, Vector("/a/*/c", "/exact$"), None)
    assert(!allowed(r, "/a/b/c"))
    assert(!allowed(r, "/a/xx/cde")) // prefix after wildcard ok
    assert(allowed(r, "/a/b"))
    assert(!allowed(r, "/exact"))
    assert(allowed(r, "/exactly"))
  }

  test("empty rules allow everything") {
    assert(allowed(empty, "/anything"))
    assert(allowed(parse("User-agent: other\nDisallow: /"), "/x"))
  }
}

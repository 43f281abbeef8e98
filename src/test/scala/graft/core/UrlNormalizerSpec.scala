package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}

class UrlNormalizerSpec extends AnyFunSuite with PropHelper {
  import UrlNormalizer._

  test("golden normalizations") {
    assert(normalize("HTTP://Host0.Example:80/a/../b") == Some("http://host0.example/b"))
    assert(normalize("HTTPS://Host0.example:443/a/../b") == Some("https://host0.example/b"))
    assert(normalize("https://host0.example") == Some("https://host0.example/"))
    assert(normalize("https://host0.example/#frag") == Some("https://host0.example/"))
    assert(normalize("https://h.example/p?b=2&a=1") == Some("https://h.example/p?a=1&b=2"))
    assert(normalize("https://h.example/p?") == Some("https://h.example/p"))
    assert(normalize("https://h.example/%7Euser/%2fx") == Some("https://h.example/~user/%2Fx"))
    assert(normalize("https://h.example:8080/x") == Some("https://h.example:8080/x"))
    assert(normalize("https://user:pw@h.example/x") == Some("https://h.example/x"))
    assert(normalize("mailto:x@y.z").isEmpty)
    assert(normalize("javascript:void(0)").isEmpty)
    assert(normalize("ftp://h.example/x").isEmpty)
    assert(normalize("/relative/only").isEmpty)
  }

  test("golden resolutions") {
    val base = "https://h.example/dir/page.html"
    assert(resolve(base, "/abs") == Some("https://h.example/abs"))
    assert(resolve(base, "other.html") == Some("https://h.example/dir/other.html"))
    assert(resolve(base, "../up") == Some("https://h.example/up"))
    assert(resolve(base, "//cdn.example/x") == Some("https://cdn.example/x"))
    assert(resolve(base, "http://o.example/y") == Some("http://o.example/y"))
    assert(resolve(base, "?q=1") == Some("https://h.example/dir/page.html?q=1"))
    assert(resolve(base, "#sec").isEmpty)
    assert(resolve(base, "").isEmpty)
  }

  test("surt host reversal") {
    assert(surtHost("www.example.com") == "com,example,www")
    assert(surtHost("host3.example") == "example,host3")
    assert(surtHost("EXAMPLE") == "example")
  }

  test("pathOf includes sorted query") {
    assert(pathOf("https://h.example/a/b?x=1") == "/a/b?x=1")
    assert(pathOf("https://h.example") == "/")
  }

  private val hostGen: Gen[String] = for {
    n <- Gen.choose(1, 3)
    parts <- Gen.listOfN(n, Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(8).mkString))
  } yield parts.mkString(".") + ".example"

  private val pathSeg: Gen[String] =
    Gen.oneOf(Gen.listOf(Gen.alphaNumChar).map(_.take(6).mkString), Gen.const("."), Gen.const(".."))

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HTTP", "Https")
    host <- hostGen
    nseg <- Gen.choose(0, 5)
    segs <- Gen.listOfN(nseg, pathSeg)
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    q <- Gen.oneOf("", "?b=2&a=1", "?z=%41&a=%7e", "?dup=1&dup=0")
    frag <- Gen.oneOf("", "#x")
  } yield s"$scheme://$host$port/${segs.mkString("/")}$q$frag"

  test("normalize is idempotent (property)") {
    check(Prop.forAll(urlGen) { u =>
      normalize(u).forall(n => normalize(n) == Some(n))
    })
  }

  test("normalized urls always have scheme://host/path shape (property)") {
    check(Prop.forAll(urlGen) { u =>
      normalize(u).forall { n =>
        val p = parse(n)
        p.isDefined && p.get.path.startsWith("/") &&
          p.get.host == p.get.host.toLowerCase && !n.contains("#")
      }
    })
  }

  test("resolve(base, href) equals normalize when href absolute (property)") {
    check(Prop.forAll(urlGen, urlGen)((b, u) => resolve(b, u) == normalize(u)))
  }

  test("surt is reversible (property)") {
    check(Prop.forAll(hostGen) { h =>
      surtHost(h).split(',').reverse.mkString(".") == h.toLowerCase
    })
  }
}

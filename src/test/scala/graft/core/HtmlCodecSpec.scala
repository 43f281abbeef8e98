package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Arbitrary}

class HtmlCodecSpec extends AnyFunSuite with PropHelper {
  import HtmlCodec._

  test("golden roundtrip") {
    val text = "Hello <world> & \"friends\"\nSecond line."
    val links = Seq("/p1", "https://other.example/x", "/p1?a=1&b=2")
    val html = synth("T <1>", text, links)
    assert(extractText(html) == Some(text))
    assert(extractTitle(html) == Some("T <1>"))
    assert(extractLinks(html) == links)
  }

  test("malformed html yields None (ParsingException path)") {
    assert(extractText("<html><body>no article</body></html>").isEmpty)
    assert(extractText("<article>never closed").isEmpty)
  }

  test("link filter matches reference semantics (HabrParser.scala:22-26)") {
    assert(keepLink("/p1", "h.example"))
    assert(keepLink("https://h.example/x", "h.example"))
    assert(!keepLink("https://other.example/x", "h.example"))
  }

  test("extractText(synth(...)) is byte-identical for ALL strings (property)") {
    check(Prop.forAll(Arbitrary.arbitrary[String], Arbitrary.arbitrary[String]) {
      (title, text) =>
        extractText(synth(title, text, Seq("/a"))) == Some(text) &&
          extractTitle(synth(title, text, Nil)) == Some(title)
    }, minSuccessful = 500)
  }

  test("extractLinks preserves order and content (property)") {
    val linkGen = Gen.listOf(Gen.oneOf(
      Gen.listOf(Gen.alphaNumChar).map("/" + _.mkString),
      Gen.const("https://x.example/y?a=1&b=\"q\"")))
    check(Prop.forAll(linkGen) { links =>
      extractLinks(synth("t", "body", links)) == links
    })
  }

  test("utf-8 bytes roundtrip") {
    val text = "ünïcødé ☃ текст 中文"
    assert(extractTextBytes(synthBytes("t", text, Nil)) == Some(text))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.Html

class HtmlSpec extends AnyFunSuite {

  val base = "https://site0001.example/p/1"

  test("absolute, root-relative, scheme-relative, relative hrefs") {
    val html =
      """<a href="https://other.example/x">a</a>
        |<a href='/root/path'>b</a>
        |<a href=//cdn.example/lib.js>c</a>
        |<a href="sub/page.html">d</a>
        |<a href="../up.html">e</a>""".stripMargin
    assert(Html.extractHrefs(html, "https://site.example/dir/page.html") == Seq(
      "https://other.example/x",
      "https://site.example/root/path",
      "https://cdn.example/lib.js",
      "https://site.example/dir/sub/page.html",
      "https://site.example/up.html"))
  }

  test("relative href merges against the base PATH, not its query (RFC 3986 §5.3)") {
    // a '/' inside the base's query must not become the merge directory
    assert(Html.extractHrefs("""<a href="a">x</a>""", "https://h.example/p?x=/y")
      == Seq("https://h.example/a"))
    assert(Html.extractHrefs("""<a href="b.html">x</a>""", "https://h.example/d/p.html?q=/z/")
      == Seq("https://h.example/d/b.html"))
  }

  test("fragment stripped; non-http(s) and fragment-only dropped") {
    val html =
      """<a href="https://x.example/a#frag">a</a>
        |<a href="#top">b</a>
        |<a href="mailto:x@y.z">c</a>
        |<a href="ftp://files.example/f">d</a>
        |<a href="javascript:void(0)">e</a>""".stripMargin
    assert(Html.extractHrefs(html, base) == Seq("https://x.example/a"))
  }

  test("entity-decoded href; bare and single quotes; case-insensitive tag") {
    val html = """<A HREF='https://x.example/q?a=1&amp;b=2'>x</A> <a id=z href=https://y.example/p>y</a>"""
    assert(Html.extractHrefs(html, base) ==
      Seq("https://x.example/q?a=1&b=2", "https://y.example/p"))
  }

  test("non-anchor tags and anchors without href ignored") {
    val html = """<link href="https://s.example/c.css"><a name="n">x</a><a href="https://ok.example/">y</a>"""
    assert(Html.extractHrefs(html, base) == Seq("https://ok.example/"))
  }

  test("extractText strips tags, elides script/style/comments, decodes, collapses") {
    val html =
      """<html><head><title>T</title><style>p { color: red; }</style>
        |<script>var x = "<b>not text</b>";</script></head>
        |<body><p>Hello   &amp; <b>world</b>!</p>
        |<!-- a comment --> &lt;tag&gt; &quot;q&#39;
        |</body></html>""".stripMargin
    assert(Html.extractText(html) == "T Hello & world! <tag> \"q'")
  }

  test("removeDotSegments per RFC 3986 §5.2.4") {
    assert(Html.removeDotSegments("/a/b/c/./../../g") == "/a/g")
    assert(Html.removeDotSegments("/../x") == "/x")
    assert(Html.removeDotSegments("/a/../../b") == "/b")
  }

  test("unterminated tag does not loop") {
    assert(Html.extractHrefs("<a href=\"https://x.example/a", base) == Seq())
    assert(Html.extractText("text <a unterminated") == "text")
  }
}

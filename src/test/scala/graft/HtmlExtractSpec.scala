package graft

import org.apache.spark.sql.functions._

import graft.functions.HtmlFunctions._

/** Specs for the HTML → text extraction expressions (HtmlExpressions.scala)
  * — exercised through real DataFrame plans so the codegen path is what
  * runs, plus the SQL registration both registries expose.
  */
class HtmlExtractSpec extends SparkTestBase {

  import spark.implicits._

  private def extract(html: String): String =
    spark.range(1).select(htmlText(lit(html)).as("t")).head().getString(0)

  private def extractMain(html: String, density: Double = 0.5, minChars: Int = 0): String =
    spark.range(1).select(htmlMainText(lit(html), density, minChars).as("t"))
      .head().getString(0)

  test("tags strip, block tags break lines, inline tags do not split words") {
    extract("<p>Hello <b>world</b></p><p>Second</p>") shouldBe "Hello world\nSecond"
    // an inline tag inside a word must not insert a space
    extract("re<i>mark</i>able") shouldBe "remarkable"
    extract("a<br>b<br/>c") shouldBe "a\nb\nc"
    // list items and headings are lines
    extract("<h1>Title</h1><ul><li>one</li><li>two</li></ul>") shouldBe "Title\none\ntwo"
    // table cells join with a space, rows break
    extract("<table><tr><td>a</td><td>b</td></tr><tr><td>c</td></tr></table>") shouldBe "a b\nc"
  }

  test("script, style, noscript, comments, and declarations vanish whole") {
    extract("<script>if (1 < 2) { x(\"<a href='y'>\"); }</script>text") shouldBe "text"
    extract("<style>p > a { color: red }</style>text") shouldBe "text"
    extract("<noscript><p>enable js</p></noscript>text") shouldBe "text"
    extract("a<!-- hidden <p>not text</p> -->b") shouldBe "ab"
    extract("<!DOCTYPE html><?xml version=\"1.0\"?>text") shouldBe "text"
    extract("<![CDATA[ raw <stuff> ]]>text") shouldBe "text"
    // case-insensitive close tags; SCRIPTX is not SCRIPT
    extract("<SCRIPT>var a;</SCRIPT>ok") shouldBe "ok"
    extract("<scriptx>inner</scriptx> ok") shouldBe "inner ok"
    // unterminated script swallows to EOF instead of leaking code as text
    extract("before<script>var x = 1;") shouldBe "before"
  }

  test("attributes scan quote-aware: a literal > inside href stays in-tag") {
    extract("<a href=\"/x?a>b\">link</a> out") shouldBe "link out"
    extract("<img alt='5 > 3'>after") shouldBe "after"
  }

  test("entities decode; unknown entities and stray & stay literal") {
    extract("a &amp; b &lt;c&gt; &quot;d&quot; &apos;e&apos;") shouldBe "a & b <c> \"d\" 'e'"
    extract("x&nbsp;y") shouldBe "x y"
    extract("&#65;&#x42;&#x1F600;") shouldBe "AB😀"
    extract("AT&T &unknown; 5 & 3 &#xZZ;") shouldBe "AT&T &unknown; 5 & 3 &#xZZ;"
    // a surrogate code point would mangle to '?' in UTF-8 — stays literal
    extract("a &#xD800; b") shouldBe "a &#xD800; b"
  }

  test("whitespace collapses to the RE2 \\s class semantics, lines trim") {
    extract("<p>  a \t\n b\r\nc  </p>") shouldBe "a b c"
    // empty lines are dropped, not emitted
    extract("<p></p><p>  </p><p>x</p>") shouldBe "x"
    // a stray '<' that is not a tag is text; "<3" starts with a digit so
    // it is text too, not a tag that would swallow to the next '>'
    extract("<p>a < b</p>") shouldBe "a < b"
    extract("<p>i <3 u > all</p>") shouldBe "i <3 u > all"
    extract("") shouldBe ""
  }

  test("main-text drops link-dense boilerplate lines and short lines") {
    val page = "<nav><a href=\"/\">Home</a> | <a href=\"/a\">About</a></nav>" +
      "<p>Real content with <a href=\"/r\">one link</a> inside a sentence.</p>" +
      "<footer><a href=\"#\">Top</a></footer>"
    extract(page) shouldBe "Home | About\nReal content with one link inside a sentence.\nTop"
    extractMain(page) shouldBe "Real content with one link inside a sentence."
    // nested <a> depth tracks correctly across the close tag
    extractMain("<p><a href=\"x\">all anchor text here</a></p>") shouldBe ""
    // minChars cuts below-threshold lines even at zero link density
    extractMain("<p>ok</p><p>long enough line</p>", minChars = 5) shouldBe "long enough line"
    // a self-closing <a/> opens no anchor scope
    extractMain("<a id=\"top\"/><p>Real article text stays.</p>") shouldBe
      "Real article text stays."
    // an UNCLOSED <a> must not poison the rest of the document: block
    // boundaries auto-close it (the pre-HTML5 browser rule)
    extractMain("<nav><a href=\"/\">Home</nav><p>Content sentence here.</p>") shouldBe
      "Content sentence here."
  }

  test("round trip: escaped text in a full page extracts to collapsed text") {
    // the q_html_extract contract: wrap entity-escaped text in page chrome,
    // extract, and expect exactly the \s-collapsed trimmed original
    val texts = Seq("plain words", "  spaced\t\tout \n lines \r\n here ",
      "symbols & <tags> kept as text", "", "   ")
    texts.foreach { t =>
      val esc = t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      val page = "<html><head><script>if (1 < 2) { nav(\"<a href='x'>\"); }</script>" +
        "<style>p > a {color:red}</style></head><body>" +
        "<nav><a href=\"/\">Home</a> | <a href=\"/about\">About</a></nav><p>" + esc +
        "</p><footer><a href=\"#top\">Top</a></footer></body></html>"
      val expected = t.replaceAll("[ \\t\\n\\r\\f]+", " ").trim
      extractMain(page) shouldBe expected
    }
  }

  test("html_links extracts hrefs in order, decoded, skipping script/comments") {
    def links(html: String): Seq[String] =
      spark.range(1).select(htmlLinks(lit(html)).as("l")).head().getSeq[String](0)
    links("<a href=\"/one\">1</a><p><a href='/two?a=1&amp;b=2'>2</a></p>" +
      "<a href=unquoted>3</a><a name=\"no-href\">4</a>") shouldBe
      Seq("/one", "/two?a=1&b=2", "unquoted")
    // script/comment content contributes nothing; xhref is not href
    links("<script>var u = \"<a href='/x'>\";</script>" +
      "<!-- <a href='/y'> --><a xhref='/z' href='/real'>r</a>") shouldBe Seq("/real")
    // duplicates kept in document order (frontier dedup is the caller's)
    links("<a href='/a'>1</a><a href='/a'>2</a>") shouldBe Seq("/a", "/a")
    // attribute order and whitespace around = are tolerated
    links("<a class='x' href = \"/spaced\">s</a>") shouldBe Seq("/spaced")
    links("no links here") shouldBe Seq.empty
    // a stray '<' in text must not swallow the following anchor
    links("<p>a < b <a href=\"/z\">z</a></p>") shouldBe Seq("/z")
    // 'href=' inside ANOTHER attribute's quoted value never matches
    links("<a title=\"see href=/fake here\" href=\"/real\">x</a>") shouldBe Seq("/real")
  }

  test("null in, null out; SQL registration reaches both functions") {
    val r = spark.range(1)
      .select(htmlText(lit(null).cast("string")).as("a"),
        htmlMainText(lit(null).cast("string")).as("b")).head()
    r.isNullAt(0) shouldBe true
    r.isNullAt(1) shouldBe true
    spark.sql("SELECT html_text('<p>sql works</p>') AS t").head().getString(0) shouldBe
      "sql works"
    spark.sql("SELECT html_main_text('<p><a href=x>nav only</a></p>') AS t")
      .head().getString(0) shouldBe ""
    spark.sql("SELECT html_links('<a href=\"/sql\">x</a>') AS l")
      .head().getSeq[String](0) shouldBe Seq("/sql")
    // arity errors fail loud, matching the other registered functions
    val e = intercept[Exception](spark.sql("SELECT html_text('a', 'b')").collect())
    e.getMessage should include("html_text")
  }
}

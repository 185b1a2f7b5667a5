package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.graft.ColumnBridge.{colOf, exprOf}

/** HTML → text extraction for web-crawl ingest (the CommonCrawl/WARC step a
  * training corpus runs before any text-quality tier): a single-pass
  * character state machine, no external parser. What it does, in document
  * order:
  *
  *   - `<script>` / `<style>` / `<noscript>` elements are dropped WHOLE
  *     (content skipped to the matching close tag, case-insensitive);
  *     comments (`<!-- -->`), CDATA sections, and `<!`/`<?` declarations
  *     are skipped.
  *   - every other tag is stripped; attribute values are scanned
  *     quote-aware so a literal `>` inside `href="..."` does not end the
  *     tag early.
  *   - block-level tags (`p div li ul ol h1..h6 br tr table ...`) become
  *     LINE breaks; inline tags (`a b i span em ...`) do not split words.
  *   - character entities decode: the named set every crawler hits
  *     (`&amp; &lt; &gt; &quot; &apos; &nbsp;`) plus numeric `&#123;` /
  *     `&#x1F600;` code points; an unrecognized `&...` stays literal.
  *   - whitespace (space, tab, CR, LF, FF — exactly the RE2 `\s` class, so
  *     a SQL oracle can replay the collapse with `regexp_replace`)
  *     collapses to single spaces within a line; lines arrive trimmed and
  *     empty lines are dropped.
  *
  * Two expressions share the pass: [[HtmlText]] returns every text line
  * joined by `\n`; [[HtmlMainText]] additionally drops lines whose
  * LINK DENSITY (fraction of non-space characters inside `<a>` elements)
  * exceeds a threshold — the classic nav/footer boilerplate cut (the
  * line-level heuristic readability-style extractors use) — and lines
  * shorter than `minChars`. Both run map-side inside whole-stage codegen
  * (the `compute`-via-references pattern of [[TextExpressions]]); at
  * corpus scale the extraction cost is one linear scan per document, no
  * shuffle, no driver involvement.
  */
private[functions] object HtmlExtraction {

  /** One extracted line: trimmed, whitespace-collapsed text plus the count
    * of its non-space chars that were inside an `<a>` element.
    */
  final case class Line(text: String, anchorChars: Int, textChars: Int)

  private val BlockTags: Set[String] = Set(
    "p", "div", "br", "li", "ul", "ol", "dl", "dt", "dd", "h1", "h2", "h3",
    "h4", "h5", "h6", "tr", "table", "thead", "tbody", "tfoot", "caption",
    "blockquote", "pre", "section", "article", "header", "footer", "nav",
    "aside", "form", "hr", "figure", "figcaption", "main", "address",
    "fieldset", "legend", "details", "summary", "title")

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  /** Case-insensitive match of `what` at `html[i..)`, followed by a
    * delimiter that ends a tag name (whitespace, `>`, `/`, or EOF) —
    * so `<scriptx>` is NOT a script element.
    */
  private def tagAt(html: String, i: Int, what: String): Boolean = {
    if (i + what.length > html.length) return false
    var k = 0
    while (k < what.length) {
      val c = html.charAt(i + k)
      val w = what.charAt(k)
      if (Character.toLowerCase(c) != w) return false
      k += 1
    }
    val j = i + what.length
    j >= html.length || isWs(html.charAt(j)) || html.charAt(j) == '>' ||
      html.charAt(j) == '/'
  }

  /** Index just past the closing `>` of the tag starting at `html(start)`
    * (which is `<`), scanning attribute values quote-aware. Returns
    * html.length when the tag never closes (truncated page).
    */
  private def skipTag(html: String, start: Int): Int = {
    var i = start + 1
    var quote: Char = 0
    while (i < html.length) {
      val c = html.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return i + 1
      i += 1
    }
    html.length
  }

  /** Index just past `needle` (case-insensitive) at or after `from`, or
    * html.length when absent.
    */
  private def skipPast(html: String, from: Int, needle: String): Int = {
    var i = from
    val n = needle.length
    while (i + n <= html.length) {
      var k = 0
      while (k < n && Character.toLowerCase(html.charAt(i + k)) == needle.charAt(k)) k += 1
      if (k == n) return i + n
      i += 1
    }
    html.length
  }

  /** Decode the entity starting at `html(i)` (`&`). Returns (decoded text,
    * index past the entity), or null text when it is not a recognized
    * entity (caller emits the `&` literally).
    */
  private def entityAt(html: String, i: Int): (String, Int) = {
    val semi = {
      var j = i + 1
      val limit = math.min(html.length, i + 11) // longest we decode: &#x10FFFF;
      while (j < limit && html.charAt(j) != ';') j += 1
      if (j < limit && j > i + 1) j else -1
    }
    if (semi < 0) return (null, i)
    val body = html.substring(i + 1, semi)
    val decoded: String = body match {
      case "amp" => "&"
      case "lt" => "<"
      case "gt" => ">"
      case "quot" => "\""
      case "apos" => "'"
      case "nbsp" => " "
      case _ if body.length >= 2 && body.charAt(0) == '#' =>
        try {
          val cp =
            if (body.charAt(1) == 'x' || body.charAt(1) == 'X')
              Integer.parseInt(body.substring(2), 16)
            else Integer.parseInt(body.substring(1), 10)
          // surrogate code points would decode to a lone UTF-16 surrogate,
          // which UTF-8 encoding mangles to '?' — leave the entity literal
          if (Character.isValidCodePoint(cp) && cp > 0 &&
              !(cp >= Character.MIN_SURROGATE && cp <= Character.MAX_SURROGATE))
            new String(Character.toChars(cp))
          else null
        } catch { case _: NumberFormatException => null }
      case _ => null
    }
    if (decoded == null) (null, i) else (decoded, semi + 1)
  }

  /** The shared single-pass extraction: HTML in, trimmed/collapsed text
    * lines out (empty lines already dropped).
    */
  def extractLines(html: String): Array[Line] = {
    val lines = scala.collection.mutable.ArrayBuffer.empty[Line]
    val sb = new java.lang.StringBuilder
    var anchorChars = 0
    var textChars = 0
    var pendingSpace = false
    var anchorDepth = 0

    def flushLine(): Unit = {
      if (sb.length > 0) {
        lines += Line(sb.toString, anchorChars, textChars)
        sb.setLength(0)
      }
      anchorChars = 0
      textChars = 0
      pendingSpace = false
    }
    def emitChar(c: Char): Unit =
      if (isWs(c)) { if (sb.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
        textChars += 1
        if (anchorDepth > 0) anchorChars += 1
      }
    def emit(s: String): Unit = {
      var k = 0
      while (k < s.length) { emitChar(s.charAt(k)); k += 1 }
    }

    var i = 0
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) i = skipPast(html, i + 4, "-->")
        else if (html.startsWith("<![CDATA[", i)) i = skipPast(html, i + 9, "]]>")
        else if (tagAt(html, i + 1, "script")) {
          val close = skipPast(html, skipTag(html, i), "</script")
          i = if (close >= n) n else skipTag(html, close - "</script".length)
        } else if (tagAt(html, i + 1, "style")) {
          val close = skipPast(html, skipTag(html, i), "</style")
          i = if (close >= n) n else skipTag(html, close - "</style".length)
        } else if (tagAt(html, i + 1, "noscript")) {
          val close = skipPast(html, skipTag(html, i), "</noscript")
          i = if (close >= n) n else skipTag(html, close - "</noscript".length)
        } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          i = skipTag(html, i)
        } else {
          // a real tag: read the (possibly /-prefixed) name — tag names
          // START with a letter ("<3 items>" is text, not a tag)
          val closing = i + 1 < n && html.charAt(i + 1) == '/'
          val nameStart = if (closing) i + 2 else i + 1
          var j = nameStart
          if (j < n && Character.isLetter(html.charAt(j))) {
            j += 1
            while (j < n && Character.isLetterOrDigit(html.charAt(j))) j += 1
          }
          val name = html.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
          if (name.isEmpty) { emitChar('<'); i += 1 } // stray '<' is text
          else {
            val end = skipTag(html, i)
            if (name == "a") {
              // a self-closing <a/> opens nothing; an unclosed <a> must
              // not poison the rest of the document (block reset below)
              val selfClosing = end - 2 >= i && html.charAt(end - 2) == '/'
              if (closing) anchorDepth = math.max(0, anchorDepth - 1)
              else if (!selfClosing) anchorDepth += 1
            }
            if (BlockTags.contains(name)) {
              flushLine()
              // browsers auto-close <a> at block boundaries (pre-HTML5
              // rule); without this, one unclosed <a> marks every later
              // line link-dense and main-text drops the whole document.
              // Cost: an HTML5 card link wrapping block content counts
              // its inner lines as non-anchor — kept, the safe direction.
              anchorDepth = 0
            }
            else if (name == "td" || name == "th") pendingSpace = sb.length > 0
            i = end
          }
        }
      } else if (c == '&') {
        val (decoded, next) = entityAt(html, i)
        if (decoded == null) { emitChar('&'); i += 1 }
        else { emit(decoded); i = next }
      } else {
        emitChar(c)
        i += 1
      }
    }
    flushLine()
    lines.toArray
  }

  /** The `href` values of `<a>` tags, in document order with duplicates
    * kept (callers `array_distinct` when building a frontier). Runs the
    * same skip logic as [[extractLines]] for comments/script/style so URL
    * strings inside JavaScript do not count as links; values entity-decode
    * (`&amp;` in query strings is the common case).
    */
  def extractLinks(html: String): Array[String] = {
    val links = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = html.length
    while (i < n) {
      if (html.charAt(i) == '<') {
        if (html.startsWith("<!--", i)) i = skipPast(html, i + 4, "-->")
        else if (html.startsWith("<![CDATA[", i)) i = skipPast(html, i + 9, "]]>")
        else if (tagAt(html, i + 1, "script")) {
          val close = skipPast(html, skipTag(html, i), "</script")
          i = if (close >= n) n else skipTag(html, close - "</script".length)
        } else if (tagAt(html, i + 1, "style")) {
          val close = skipPast(html, skipTag(html, i), "</style")
          i = if (close >= n) n else skipTag(html, close - "</style".length)
        } else if (tagAt(html, i + 1, "a")) {
          val end = skipTag(html, i)
          attrValue(html, i, end, "href").foreach(links += _)
          i = end
        } else if (i + 1 < n && (Character.isLetter(html.charAt(i + 1)) ||
            html.charAt(i + 1) == '/' || html.charAt(i + 1) == '!' ||
            html.charAt(i + 1) == '?')) {
          i = skipTag(html, i)
        } else i += 1 // stray '<' in text ("a < b") is not a tag — do not
                      // let it swallow a following <a> up to its '>'
      } else i += 1
    }
    links.toArray
  }

  /** The decoded value of attribute `name` inside the tag at
    * `html[tagStart, tagEnd)`, or None. Quoted or unquoted values; the
    * match must sit at a word boundary (`xhref=` is not `href=`) and the
    * scan is quote-aware so `href=` appearing inside ANOTHER attribute's
    * quoted value (title="see href=/fake") never matches.
    */
  private def attrValue(
      html: String, tagStart: Int, tagEnd: Int, name: String): Option[String] = {
    var i = tagStart + 1
    var quote: Char = 0
    while (i + name.length + 1 < tagEnd) {
      val cHere = html.charAt(i)
      if (quote != 0) { if (cHere == quote) quote = 0; i += 1 }
      else if (cHere == '"' || cHere == '\'') { quote = cHere; i += 1 }
      else {
      val before = html.charAt(i - 1)
      val boundary = isWs(before) || before == '<'
      var k = 0
      while (k < name.length &&
        Character.toLowerCase(html.charAt(i + k)) == name.charAt(k)) k += 1
      if (boundary && k == name.length) {
        // skip ws around '='
        var j = i + name.length
        while (j < tagEnd && isWs(html.charAt(j))) j += 1
        if (j < tagEnd && html.charAt(j) == '=') {
          j += 1
          while (j < tagEnd && isWs(html.charAt(j))) j += 1
          if (j < tagEnd) {
            val q = html.charAt(j)
            val (vStart, vEnd) =
              if (q == '"' || q == '\'') {
                val e = html.indexOf(q, j + 1)
                (j + 1, if (e < 0 || e >= tagEnd) tagEnd - 1 else e)
              } else {
                var e = j
                while (e < tagEnd - 1 && !isWs(html.charAt(e)) && html.charAt(e) != '>') e += 1
                (j, e)
              }
            if (vEnd > vStart) {
              // entity-decode the raw value
              val raw = html.substring(vStart, vEnd)
              val sb = new java.lang.StringBuilder
              var p = 0
              while (p < raw.length) {
                if (raw.charAt(p) == '&') {
                  val (dec, next) = entityAt(raw, p)
                  if (dec == null) { sb.append('&'); p += 1 }
                  else { sb.append(dec); p = next }
                } else { sb.append(raw.charAt(p)); p += 1 }
              }
              return Some(sb.toString)
            }
            return None
          }
        }
      }
      i += 1
      }
    }
    None
  }
}

/** `html_text(html)` — every extracted text line, joined by `\n`. NULL in,
  * NULL out.
  */
case class HtmlText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "html_text"

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("htmltext", this, classOf[HtmlText].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(s: UTF8String): UTF8String =
    UTF8String.fromString(
      HtmlExtraction.extractLines(s.toString).map(_.text).mkString("\n"))

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `html_main_text(html)` — [[HtmlText]] minus boilerplate lines: a line
  * whose link density (anchor chars / text chars) exceeds `maxLinkDensity`,
  * or with fewer than `minChars` non-space chars, is dropped. Defaults keep
  * everything except pure-navigation lines (density > 0.5).
  */
case class HtmlMainText(
    child: Expression,
    maxLinkDensity: Double = 0.5,
    minChars: Int = 0)
    extends UnaryExpression with ExpectsInputTypes {
  require(maxLinkDensity >= 0.0 && maxLinkDensity <= 1.0,
    s"maxLinkDensity must be in [0, 1], got $maxLinkDensity")
  require(minChars >= 0, s"minChars must be >= 0, got $minChars")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "html_main_text"

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("htmlmain", this, classOf[HtmlMainText].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(s: UTF8String): UTF8String = {
    val kept = HtmlExtraction.extractLines(s.toString).filter { l =>
      l.textChars >= minChars &&
        (l.textChars == 0 || l.anchorChars.toDouble / l.textChars <= maxLinkDensity)
    }
    UTF8String.fromString(kept.map(_.text).mkString("\n"))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `html_links(html)` — the `href` values of `<a>` tags in document order
  * (duplicates kept), entity-decoded; script/style/comment content does not
  * contribute. The outlink edge list a crawl-frontier or link-graph
  * (PageRank) stage consumes. NULL in, NULL out.
  */
case class HtmlLinks(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "html_links"

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("htmllinks", this, classOf[HtmlLinks].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(s: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      HtmlExtraction.extractLinks(s.toString).map(UTF8String.fromString(_)))

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column builders (the [[TextFunctions]] convention). */
object HtmlFunctions {
  def htmlText(html: Column): Column = colOf(HtmlText(exprOf(html)))
  def htmlMainText(html: Column, maxLinkDensity: Double = 0.5, minChars: Int = 0): Column =
    colOf(HtmlMainText(exprOf(html), maxLinkDensity, minChars))
  def htmlLinks(html: Column): Column = colOf(HtmlLinks(exprOf(html)))
}

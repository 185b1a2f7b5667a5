package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.WarcCdx

/** Differential check of the CDXJ line parse fast path: the split-based
  * acceptance + extraction must be ROW-FOR-ROW identical to the original
  * triple-`regexp_extract` implementation over adversarial and random
  * line shapes — the fast path is a pure performance move (one bounded
  * split instead of three uncached anchored regex runs per line) and any
  * acceptance drift would silently change which damaged index lines are
  * tolerated vs dropped.
  */
class CdxParseSpec extends SparkTestBase {

  import spark.implicits._

  /** The original parse, kept verbatim as the reference semantics: three
    * anchored `regexp_extract`s over `^(\S+) (\d{14}) (\{.*)$` feeding
    * the same typed projection [[WarcCdx.read]] produces.
    */
  private def referenceParse(lines: DataFrame): DataFrame = {
    val jsonSchema = "url STRING, mime STRING, digest STRING, rid STRING, " +
      "offset STRING, length STRING, filename STRING"
    val re = "^(\\S+) (\\d{14}) (\\{.*)$"
    lines
      .select(
        regexp_extract(col("value"), re, 1).as("urlkey"),
        regexp_extract(col("value"), re, 2).as("timestamp"),
        from_json(
          when(regexp_extract(col("value"), re, 3) =!= "",
            regexp_extract(col("value"), re, 3)),
          jsonSchema, java.util.Collections.emptyMap[String, String]()).as("j"))
      .select(col("urlkey"), col("timestamp"),
        col("j.url").as("url"), col("j.mime").as("mime"),
        col("j.digest").as("digest"), col("j.rid").as("rid"),
        expr("try_cast(j.offset AS BIGINT)").as("offset"),
        expr("try_cast(j.length AS BIGINT)").as("length"),
        col("j.filename").as("filename"))
  }

  private def readVia(lines: Seq[String]): (Array[String], Array[String]) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdxparse")
    java.nio.file.Files.write(dir.resolve("x.cdxj"),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    val got = WarcCdx.read(spark, dir.toString)
    val want = referenceParse(spark.read.text(s"$dir/*.cdxj"))
    got.columns shouldBe want.columns
    def render(df: DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    (render(got), render(want))
  }

  test("fast path ≡ regex reference on hand-picked acceptance edges") {
    val json = """{"url":"https://a/","mime":"text/html","digest":"sha1:X",""" +
      """"rid":"<urn:r:1>","offset":"0","length":"42","filename":"f.warc.gz"}"""
    val cases = Seq(
      s"com,example)/ 20260101000000 $json",     // plain valid
      s"com,example)/ 20260101000000 {}",        // empty json object
      s"com,example)/ 20260101000000 {",         // unterminated json
      s"com,example)/ 20260101000000 $json tail", // trailing text rides in .*
      s"com,example)/ 2026010100000 $json",      // 13-digit ts
      s"com,example)/ 202601010000001 $json",    // 15-digit ts
      s" com,example)/ 20260101000000 $json",    // leading space
      s"com,example)/  20260101000000 $json",    // double space after key
      s"com,example)/ 20260101000000  $json",    // double space before json
      s"com,ex\tample)/ 20260101000000 $json",   // tab inside key (\S+ rejects)
      "com,ex\u000Bample)/ 20260101000000 {}",   // vertical tab inside key
      "com,ex\fample)/ 20260101000000 {}",       // form feed inside key
      "\t 20260101000000 {}",                    // key IS a tab
      s"com,example)/ 2026010100000a $json",     // non-digit in ts
      s"com,example)/ 20260101000000 x$json",    // json not starting with {
      "com,example)/ 20260101000000",            // missing json field
      "com,example)/",                           // one token
      "20260101000000 {}",                       // two tokens
      "   ",                                     // spaces only
      "{} {} {}",                                // braces everywhere
      "a 20260101000000 {\"offset\":\"not-a-number\",\"length\":\"-7\"}",
      "a 20260101000000 {\"offset\":\"9999999999999999999999\"}", // > Long.Max
      "é,ünïcode)/ 20260101000000 {\"url\":\"https://é/\"}",
      "a" * 5000 + " 20260101000000 {}"          // long key
    )
    val (got, want) = readVia(cases)
    got shouldBe want
  }

  test("fast path ≡ regex reference on seeded random line soup") {
    // biased alphabet: heavy on the structural characters so random
    // strings land NEAR the accepted shape constantly
    val rnd = new scala.util.Random(20260815L)
    val alphabet = " {}0123456789abz:\",.\t" + "\u000B\f"
    def randLine(): String = {
      val len = rnd.nextInt(40)
      val sb = new StringBuilder
      (0 until len).foreach(_ => sb += alphabet.charAt(rnd.nextInt(alphabet.length)))
      sb.toString
    }
    // plus mutation soup: take a valid line and damage one position
    val valid = "com,a)/ 20260101000000 {\"offset\":\"1\",\"length\":\"2\"," +
      "\"filename\":\"f\"}"
    def mutated(): String = {
      val i = rnd.nextInt(valid.length)
      val c = alphabet.charAt(rnd.nextInt(alphabet.length))
      valid.substring(0, i) + c + valid.substring(i + 1)
    }
    val lines = ((0 until 400).map(_ => randLine()) ++
      (0 until 400).map(_ => mutated()))
      .filterNot(l => l.exists(c => c == '\n' || c == '\r'))
      .filterNot(_.trim.isEmpty) // blank lines collapse in text round-trip
    val (got, want) = readVia(lines)
    got shouldBe want
  }
}

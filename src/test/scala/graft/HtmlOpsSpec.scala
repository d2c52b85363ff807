package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.HtmlOps

/** HTML extraction: tag/script/style stripping, entity decode order,
  * link capture, and the malformed-markup degradation mode. */
class HtmlOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def extract(html: String) =
    HtmlOps.extract(Seq((1L, html)).toDF("id", "html"), "id", "html")
      .collect()(0)

  test("full card: title, links in order, script/style dropped, entities") {
    val r = extract(
      "<html><head><title> My Doc </title><style>p{color:red}</style>" +
        "</head><body><h1>Hi</h1><p>a &amp;lt; b &nbsp; c</p>" +
        "<a href=\"https://x.org/1\">l</a>" +
        "<script>var s = \"<p>never text</p>\";</script>" +
        "<a HREF=\"https://x.org/2\">m</a></body></html>")
    assert(r.getString(1) === "My Doc")
    assert(r.getString(2) === "https://x.org/1|https://x.org/2")
    assert(r.getInt(3) === 2)
    // &amp;lt; decodes ONCE to the literal &lt; (amp is decoded last)
    assert(r.getString(4) === "My Doc Hi a &lt; b c l m")
  }

  test("no title, no links: empty strings and zero count") {
    val r = extract("<p>just text</p>")
    assert(r.getString(1) === "")
    assert(r.getString(2) === "")
    assert(r.getInt(3) === 0)
    assert(r.getString(4) === "just text")
  }

  test("multi-line script bodies and attributes strip (dotall + \\b)") {
    val r = extract(
      "<script type=\"module\">\nlet a = 1;\nlet b = 2;\n</script>" +
        "<p>kept</p><scripted>not a script tag</scripted>")
    // <scripted> must NOT match the script subtree rule (\b), but its
    // tags still strip as plain tags
    assert(r.getString(4) === "kept not a script tag")
  }

  test("malformed markup over-strips, never errors") {
    // unclosed '<' swallows text to the next '>', by documented design
    assert(extract("a < b > c").getString(4) === "a c")
    assert(extract("trailing <").getString(4) === "trailing <")
  }

  test("anchors: (href, text) pairs in document order; anchors " +
      "without href or unclosed are skipped") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val html = "<p>x</p><a href=\"https://x.org/1\">first link</a>" +
      "<a class=\"c\" href=\"https://x.org/2\" rel=\"r\">second</a>" +
      "<a name=\"no-href\">skip me</a><a href=\"https://x.org/3\">open"
    val got = Seq(html).toDF("h")
      .select(graft.text.HtmlOps.anchors(col("h")).as("a"))
      .selectExpr("transform(a, x -> struct(x.href, x.atext)) AS a")
      .as[Seq[(String, String)]].head()
    assert(got === Seq(("https://x.org/1", "first link"),
      ("https://x.org/2", "second")))
  }
}

package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → training-text extraction: the ingest step between a raw web
  * crawl and every text operator in this engine (quality rules, dedup,
  * BM25, curation all assume markup-free text).
  *
  * The whole extraction is a chain of codegen'd regexp/replace
  * projections — no UDF, no parser object, shuffle-free, linear in
  * bytes:
  *   1. drop `<script>`/`<style>` subtrees (their text is never
  *      training text),
  *   2. capture `<title>` and all `href` targets (`regexp_extract_all`
  *      — the link set feeds [[UrlOps]] canonicalization / blocklists),
  *   3. strip remaining tags to spaces, decode the five XML entities +
  *      `&nbsp;` (`&amp;` LAST, so `&amp;lt;` decodes to the literal
  *      `&lt;` exactly once), collapse whitespace.
  * Patterns stay inside RE2 ∩ java.util.regex semantics — `(?s)`,
  * lazy `.*?`, character classes — so the DuckDB oracle runs the
  * IDENTICAL chain and the result is hash-exact.
  *
  * This is extraction for TRAINING TEXT, not a DOM: malformed markup
  * degrades to over-stripping (a `<` without `>` strips to end of the
  * next tag close), never to an error — the right failure mode for
  * hostile crawl bytes at 100 TB.
  */
object HtmlOps {

  // two patterns, not one with a backreference — DuckDB's RE2 has no
  // backreferences, and the oracle must run the IDENTICAL regex
  private val Script = "(?is)<script\\b[^>]*>.*?</script\\s*>"
  private val Style = "(?is)<style\\b[^>]*>.*?</style\\s*>"
  private val Tag = "(?s)<[^>]*>"
  private val TitleRx = "(?is)<title[^>]*>(.*?)</title>"
  private val HrefRx = "(?i)href=\"([^\"]*)\""
  private val AnchorRx =
    "(?is)<a\\s[^>]*href=\"([^\"]*)\"[^>]*>(.*?)</a\\s*>"

  /** The markup-free text of `html` (entities decoded, whitespace
    * collapsed, trimmed). */
  def cleanText(html: Column): Column = {
    val noScript = regexp_replace(
      regexp_replace(html, Script, " "), Style, " ")
    val noTags = regexp_replace(noScript, Tag, " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (e, v)) =>
        replace(acc, lit(e), lit(v))
      }
    trim(regexp_replace(decoded, " +", " "))
  }

  /** `<title>` contents (first match), trimmed; '' when absent. */
  def title(html: Column): Column =
    trim(regexp_extract(html, TitleRx, 1))

  /** All `href="…"` targets, in document order. */
  def links(html: Column): Column =
    // regexp_extract_all returns the capture group when the pattern
    // has one — the quoted URL without its quotes
    regexp_extract_all(html, lit(HrefRx), lit(1))

  /** `(href, atext)` pairs of the `<a href="…">anchor text</a>`
    * elements, in document order — the anchor-text relevance signal's
    * extraction seam (anchor terms describe the TARGET document;
    * Craswell et al. 2001). One regex pass collects full matches;
    * each match re-extracts its two groups — RE2-safe, so the DuckDB
    * mirror runs the identical pattern. */
  def anchors(html: Column): Column =
    transform(regexp_extract_all(html, lit(AnchorRx), lit(0)), m =>
      struct(regexp_extract(m, AnchorRx, 1).as("href"),
        regexp_extract(m, AnchorRx, 2).as("atext")))

  /** Full extraction card over `df(htmlCol)`: title, link set (joined
    * '|' — hashable by column-wise comparators), link count, clean
    * text, and its char count. */
  def extract(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val h = col(htmlCol)
    df.select(col(idCol),
      title(h).as("title"),
      array_join(links(h), "|").as("links"),
      size(links(h)).as("n_links"),
      cleanText(h).as("clean_text"))
      .withColumn("n_chars_clean", length(col("clean_text")).cast("int"))
  }

  // --- DuckDB mirror -------------------------------------------------
  // The same chain over a SQL expression; patterns are shared literals
  // rendered from the vals above so the two cannot drift.

  private def q(s: String): String = s.replace("'", "''")

  /** DuckDB expression for [[cleanText]] over `inner`. */
  def oracleCleanTextExpr(inner: String): String = {
    val noScript = s"regexp_replace(regexp_replace($inner, " +
      s"'${q(Script)}', ' ', 'g'), '${q(Style)}', ' ', 'g')"
    val noTags = s"regexp_replace($noScript, '${q(Tag)}', ' ', 'g')"
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "''", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (e, v)) =>
        s"replace($acc, '$e', '$v')"
      }
    s"trim(regexp_replace($decoded, ' +', ' ', 'g'))"
  }

  /** DuckDB expression for [[title]]. */
  def oracleTitleExpr(inner: String): String =
    s"trim(regexp_extract($inner, '${q(TitleRx)}', 1))"

  /** DuckDB list expression for [[links]]. */
  def oracleLinksExpr(inner: String): String =
    s"regexp_extract_all($inner, '${q(HrefRx)}', 1)"
}

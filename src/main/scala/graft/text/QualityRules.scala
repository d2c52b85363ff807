package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The line-shape document filters of the C4 and Gopher cleaning
  * recipes (Raffel et al. 2020 §2.2; Rae et al. 2021 Appendix A1) —
  * the rule tier [[TextAnalysis.qualityGate]]'s word-level gate does
  * not cover: per-LINE structure (bullets, ellipses, terminal
  * punctuation), the alphabetic-word fraction, the minimum-distinct-
  * stopword rule, and the lorem-ipsum / curly-brace blocklist.
  *
  * Everything is a pure codegen'd Column program over one `split` on
  * newline — integer counts plus one IEEE division per fraction, so
  * every output is bit-identical cross-engine (the DuckDB oracle
  * mirrors each rule with the same list lambdas). Linear scan, no
  * shuffle: at 100 TB this runs inside the ingest projection.
  */
object QualityRules {

  /** Gopher's "must contain ≥2 of these" stop set (Rae et al. 2021). */
  val StopSet: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private def frac(n: Column, d: Column): Column =
    when(d > 0, n.cast("double") / d).otherwise(lit(0.0))

  /** Per-document line-shape rule columns + the combined `keep` gate.
    *
    * Lines are trimmed and blank lines dropped before any ratio; words
    * are the whitespace tokens of the newline-flattened lowercase text
    * (empty fragments dropped, consistent with [[TextAnalysis.tokens]]).
    */
  def lineRules(df: DataFrame, textCol: String = "text",
      maxBulletFrac: Double = 0.9, maxEllipsisFrac: Double = 0.3,
      minAlphaWordFrac: Double = 0.8, minStopwords: Int = 2): DataFrame = {
    val lines = filter(
      transform(split(col(textCol), "\n"), l => trim(l)),
      l => length(l) > 0)
    val words = filter(
      split(regexp_replace(lower(col(textCol)), "[\\n\\t\\r]", " "), " +"),
      w => length(w) > 0)
    df.withColumn("__lines", lines)
      .withColumn("__words", words)
      .withColumn("n_lines", size(col("__lines")))
      .withColumn("n_words", size(col("__words")))
      .withColumn("n_bullet_lines", size(filter(col("__lines"), l =>
        l.startsWith("- ") || l.startsWith("* ") || l.startsWith("•"))))
      .withColumn("n_ellipsis_lines", size(filter(col("__lines"), l =>
        l.endsWith("...") || l.endsWith("…"))))
      .withColumn("n_terminal_lines", size(filter(col("__lines"), l =>
        l.rlike("[.!?\"]$"))))
      .withColumn("n_alpha_words", size(filter(col("__words"), w =>
        w.rlike("[a-z]"))))
      .withColumn("n_stop_distinct", size(array_intersect(
        array_distinct(col("__words")),
        array(StopSet.map(lit): _*))))
      .withColumn("has_blocklist",
        lower(col(textCol)).contains("lorem ipsum") ||
          col(textCol).contains("{"))
      .withColumn("bullet_frac", frac(col("n_bullet_lines"), col("n_lines")))
      .withColumn("ellipsis_frac",
        frac(col("n_ellipsis_lines"), col("n_lines")))
      .withColumn("alpha_word_frac",
        frac(col("n_alpha_words"), col("n_words")))
      .withColumn("keep",
        col("n_lines") > 0 &&
          col("bullet_frac") <= maxBulletFrac &&
          col("ellipsis_frac") <= maxEllipsisFrac &&
          col("alpha_word_frac") >= minAlphaWordFrac &&
          col("n_stop_distinct") >= minStopwords &&
          !col("has_blocklist"))
      .drop("__lines", "__words")
  }
}

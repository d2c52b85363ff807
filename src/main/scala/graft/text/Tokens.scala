package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The corpus-wide whitespace tokenization rule — split on space runs,
  * drop empties. ONE definition: every operator that tokenizes
  * (segment/passage dedup, classifier, novelty, mixture plan, export
  * manifest) and every DuckDB oracle's
  * `list_filter(string_split(trim(text), ' '), t -> t <> '')` mirror
  * this expression; a drift in any copy would silently diverge the
  * conformance hashes, so there are no copies. */
object Tokens {
  def ws(c: Column): Column =
    filter(split(trim(c), " +"), w => length(w) > 0)

  def ws(textCol: String): Column = ws(col(textCol))
}

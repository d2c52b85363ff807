package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear text classifier over hashed n-gram features — the fastText /
  * logistic-regression quality-filter shape (CCNet, GPT-3's WebText
  * classifier, FineWeb-Edu): score(doc) = Σ w[h(feature)] over the
  * document's unigrams and bigrams, keep iff score ≥ 0.
  *
  * The weight table is the model seam: production loads trained
  * weights (a D-entry array, broadcast); here the table is a frozen
  * deterministic function of the bucket id (Knuth multiplicative hash
  * → integer in [-2000, 2000]), so the whole scorer is integer
  * arithmetic over md5 — bit-reproducible in any engine, which is what
  * lets the conformance oracle hash-check it. Swapping in real weights
  * changes ONE function, not the plan.
  *
  * Scale shape (100 TB): the score is a pure per-row projection —
  * `transform` + `aggregate` over the token array inside whole-stage
  * codegen. No explode, no shuffle, no UDF; the corpus is scanned
  * once and never exchanged. D buckets bound the feature space the
  * way hashing-trick classifiers always have.
  */
object LinearClassifier {

  /** Feature buckets. 2^12 keeps the stand-in table small; production
    * fastText uses 2^21 — the arithmetic is D-independent. */
  val D = 4096

  // Frozen stand-in weight: (bucket · 2654435761) mod 4001 − 2000,
  // bucket = [[graft.functions.Md5Bucket]] of the salted feature —
  // computed by the fused [[graft.functions.Md5FeatureSum]] kernel
  // (and by [[weightSql]] on the oracle side).

  /** Unigram-feature sum over a token-array column — the fused codegen
    * kernel ([[graft.functions.Md5FeatureSum]]); bit parity with the
    * composable `aggregate(transform(ts, t => featureWeight("u:", t)),
    * 0L, _ + _)` form (including its null edges) is pinned in
    * FunctionsSpec, and [[weightSql]] still renders the same arithmetic
    * for the oracles. */
  private def uniScore(ts: Column): Column =
    graft.functions.Md5FeatureSum.uni(ts, "u:", D)

  /** Bigram-feature sum over a token-array column — fused kernel; the
    * composable form's `when(size(ts) >= 2, …).otherwise(0)` guard
    * maps a NULL array to 0 here (size(null) is null, so the `when`
    * falls through), while the kernel itself returns 0 only for short
    * arrays — hence the explicit null guard. */
  private def biScore(ts: Column): Column =
    when(isnull(ts), lit(0L))
      .otherwise(graft.functions.Md5FeatureSum.bi(ts, "b:", D))

  /** The gate as ONE boolean Column over raw text — for callers that
    * only filter: `df.filter(LinearClassifier.keepExpr(col("text")))`
    * rides the scan as a projection+filter with no join and no second
    * derivation of the input. */
  def keepExpr(text: Column): Column = {
    val ts = Tokens.ws(text)
    uniScore(ts) + biScore(ts) >= 0
  }

  /** (doc_id, n_tokens, uni_score, bi_score, score, keep): the scored
    * corpus. keep = 1 iff score ≥ 0. Pure projection — see scaladoc. */
  def score(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withTs = df.select(col(idCol).as("doc_id"),
      Tokens.ws(textCol).as("__ts"))
    withTs.select(col("doc_id"), size(col("__ts")).as("n_tokens"),
        uniScore(col("__ts")).as("uni_score"),
        biScore(col("__ts")).as("bi_score"))
      .withColumn("score", col("uni_score") + col("bi_score"))
      .withColumn("keep", when(col("score") >= 0, 1).otherwise(0))
  }

  /** DuckDB SQL for the frozen weight of one feature expression —
    * derived from the same [[graft.functions.Md5Bucket]] definition
    * the Spark column uses, not hand-transcribed. */
  def weightSql(salt: String, inner: String): String =
    s"((${graft.functions.Md5Bucket.bucketSql(salt, inner, D)} " +
      s"* 2654435761) % 4001 - 2000)"
}

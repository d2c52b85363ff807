package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Md5Bucket
import graft.sampling.Sampling

/** Conformance queries for the deterministic sampling / splitting
  * operators ([[graft.sampling.Sampling]]) — the dataset-versioning leg
  * of a training-data pipeline (hash split, stratified sample, group
  * rebalance). md5 is identical in Spark and DuckDB, so every decision
  * is oracle-checkable down to the row. */
object SamplingOps extends QueryModule {

  // Train/test split at 0.8: membership depends only on (salt, doc_id),
  // so re-running on a grown corpus never reassigns an existing doc.
  private def sampTrainTest(s: SparkSession, d: String): DataFrame =
    Sampling.hashSplit(Tables.documents(s, d), "doc_id", 0.8)
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "split")

  private def sampTrainTestRows(s: SparkSession, d: String): DataFrame =
    Sampling.hashSplit(Tables.documents(s, d), "doc_id", 0.8)
      .orderBy("doc_id")
      .select("doc_id", "split")

  // Stratified 50% by language: ceil(|group|/2) rows per lang, members
  // chosen by hash order — proportions preserved under the en-heavy mix.
  private def sampStratified(s: SparkSession, d: String): DataFrame =
    Sampling.stratifiedSample(Tables.documents(s, d), "lang", "doc_id", 0.5)
      .orderBy("doc_id")
      .select("doc_id", "lang")

  // Balance the 20-source mix to ≤10 docs per source (the "downsample
  // the dominant domain" step of data mixing).
  private def sampBalanced(s: SparkSession, d: String): DataFrame =
    Sampling.balancedSample(Tables.documents(s, d), "source", "doc_id", 10)
      .orderBy("doc_id")
      .select("doc_id", "source")

  // Blend the language sub-corpora at target rates (en 100%, es 50%,
  // de 25%) — each doc's keep-decision is independent and re-runnable.
  private def sampWeightedMix(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    Sampling.weightedMix(Seq(
        docs.filter(col("lang") === "en") -> 1.0,
        docs.filter(col("lang") === "es") -> 0.5,
        docs.filter(col("lang") === "de") -> 0.25), "doc_id")
      .orderBy("doc_id")
      .select("doc_id", "lang", "mix_source")
  }

  // Fixed-100 eval-set carve — plans as TakeOrderedAndProject (per-
  // partition limit + one 100-row merge), never a global sort.
  private def sampFixedN(s: SparkSession, d: String): DataFrame =
    Sampling.fixedSample(Tables.documents(s, d), "doc_id", 100)
      .orderBy("doc_id")
      .select("doc_id", "lang")

  // 1M-token budget split across sources at temperature α = 0.5 —
  // the plan table a mixing job consumes (share/allocation/rate per
  // source; oversample flags sources the budget asks to repeat).
  private def sampMixturePlan(s: SparkSession, d: String): DataFrame =
    Sampling.mixturePlan(Tables.documents(s, d), "source", "text",
        budgetTokens = 1000000L)
      .orderBy("source")

  // Execute the same 1M-token plan: every (source, doc, epoch) row of
  // the realized mix — oversampled sources repeat epochs, undersampled
  // ones keep a hash-fraction at epoch 0.
  private def sampMixtureEpochs(s: SparkSession, d: String): DataFrame =
    Sampling.executeMixturePlan(Tables.documents(s, d), "source",
        "doc_id", "text", budgetTokens = 1000000L)
      .orderBy("source", "doc_id", "epoch")

  // The same 1M-token plan with the honest denominator: per-source
  // budgets measured in SUBWORD tokens (pinned-merge BPE), not
  // whitespace words — the token-count seam mixturePlan exposes.
  private def sampMixtureBpe(s: SparkSession, d: String): DataFrame =
    Sampling.mixturePlan(Tables.documents(s, d), "source", "text",
        budgetTokens = 1000000L,
        tokenCount = Some(graft.text.Bpe.nTokens(
          coalesce(col("text"), lit("")))))
      .orderBy("source")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "samp_fixed_n"         -> (sampFixedN _),
    "samp_train_test"      -> (sampTrainTest _),
    "samp_train_test_rows" -> (sampTrainTestRows _),
    "samp_stratified"      -> (sampStratified _),
    "samp_balanced"        -> (sampBalanced _),
    "samp_weighted_mix"    -> (sampWeightedMix _),
    "samp_mixture_plan"    -> (sampMixturePlan _),
    "samp_mixture_epochs"  -> (sampMixtureEpochs _),
    "samp_mixture_bpe"     -> (sampMixtureBpe _)
  )

  // 0.8 → ⌊0.8·65536⌋ = 52428 = 0xcccc (the 16-bit quantized fraction)
  private val splitCase =
    """CASE WHEN substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc'
            THEN 'train' ELSE 'test' END"""

  // Shared plan CTE chain (av → tot → w → z → sel): the token census,
  // √-share arithmetic, and allocation used verbatim by both mixture
  // oracles — one definition, no per-entry drift.
  private def mixPlanCtes(tokSql: String) =
    s"""WITH av AS (
         SELECT source,
                CAST(sum($tokSql) AS BIGINT) AS n_tokens
         FROM documents GROUP BY source
       ),""" +
    """
       tot AS (SELECT sum(n_tokens) AS tot FROM av),
       w AS (SELECT source, n_tokens,
                    sqrt(CAST(n_tokens AS DOUBLE) / tot) AS w
             FROM av, tot),
       z AS (SELECT list_reduce(list(w ORDER BY source),
                      (a, b) -> a + b) AS z FROM w),
       sel AS (SELECT source, n_tokens, w / z AS share,
                      CAST(floor(CAST(1000000 AS DOUBLE) * (w / z))
                        AS BIGINT) AS target_tokens
               FROM w, z)"""

  private val MixPlanCtes = mixPlanCtes(
    "len(list_filter(string_split(trim(text), ' '), t -> t <> ''))")

  val oracles: Map[String, String] = Map(
    "samp_fixed_n" ->
      """SELECT doc_id, lang FROM (
           SELECT doc_id, lang FROM documents
           ORDER BY md5('fix' || CAST(doc_id AS VARCHAR)), doc_id
           LIMIT 100)
         ORDER BY doc_id""",

    "samp_train_test" ->
      s"""SELECT lang, $splitCase AS split, count(*) AS n
          FROM documents
          GROUP BY lang, 2 ORDER BY lang, split""",

    "samp_train_test_rows" ->
      s"""SELECT doc_id, $splitCase AS split
          FROM documents ORDER BY doc_id""",

    "samp_stratified" ->
      """SELECT doc_id, lang FROM (
           SELECT doc_id, lang,
                  row_number() OVER (
                    PARTITION BY lang
                    ORDER BY md5('strat' || CAST(doc_id AS VARCHAR)), doc_id)
                    AS rn,
                  count(*) OVER (PARTITION BY lang) AS n
           FROM documents)
         WHERE rn <= ceil(n * 0.5)
         ORDER BY doc_id""",

    "samp_balanced" ->
      """SELECT doc_id, source FROM (
           SELECT doc_id, source,
                  row_number() OVER (
                    PARTITION BY source
                    ORDER BY md5('bal' || CAST(doc_id AS VARCHAR)), doc_id)
                    AS rn
           FROM documents)
         WHERE rn <= 10
         ORDER BY doc_id""",

    // 0.5 → 0x8000, 0.25 → 0x4000 (16-bit quantized weights)
    "samp_weighted_mix" ->
      """SELECT doc_id, lang, mix_source FROM (
           SELECT doc_id, lang, 0 AS mix_source FROM documents
           WHERE lang = 'en'
           UNION ALL
           SELECT doc_id, lang, 1 FROM documents
           WHERE lang = 'es'
             AND substr(md5('mix1' || CAST(doc_id AS VARCHAR)), 1, 4) < '8000'
           UNION ALL
           SELECT doc_id, lang, 2 FROM documents
           WHERE lang = 'de'
             AND substr(md5('mix2' || CAST(doc_id AS VARCHAR)), 1, 4) < '4000')
         ORDER BY doc_id""",

    // mirrors Sampling.mixturePlan operand-for-operand: √ is correctly
    // rounded IEEE, the normalizer is an order-pinned fold over
    // sources sorted by name (list_reduce's first-element seed ≡
    // Spark's 0.0+w₁ for positive weights), every division/multiply
    // appears in the same association order
    "samp_mixture_plan" ->
      (MixPlanCtes + """
         SELECT source, n_tokens, share, target_tokens,
                CASE WHEN n_tokens > 0
                     THEN CAST(target_tokens AS DOUBLE)
                          / CAST(n_tokens AS DOUBLE) END AS sample_rate,
                CASE WHEN n_tokens > 0
                      AND CAST(target_tokens AS DOUBLE)
                          / CAST(n_tokens AS DOUBLE) > 1.0
                     THEN 1 ELSE 0 END AS oversample
         FROM sel ORDER BY source"""),

    // identical plan arithmetic, subword token census (the BPE chain
    // rendered from the same frozen merge table as the engine's)
    "samp_mixture_bpe" ->
      (mixPlanCtes(graft.text.Bpe.oracleNTokensExpr("coalesce(text, '')"))
        + """
         SELECT source, n_tokens, share, target_tokens,
                CASE WHEN n_tokens > 0
                     THEN CAST(target_tokens AS DOUBLE)
                          / CAST(n_tokens AS DOUBLE) END AS sample_rate,
                CASE WHEN n_tokens > 0
                      AND CAST(target_tokens AS DOUBLE)
                          / CAST(n_tokens AS DOUBLE) > 1.0
                     THEN 1 ELSE 0 END AS oversample
         FROM sel ORDER BY source"""),

    // mirrors Sampling.executeMixturePlan: same plan CTEs, rate →
    // (⌊rate⌋ full epochs, 16-bit-quantized remainder), the extra
    // epoch drawn by the shared md5-bucket rule; range(0, n) is empty
    // at n ≤ 0, which drops unlucky docs exactly like the Spark
    // filter does
    "samp_mixture_epochs" ->
      (MixPlanCtes + s""",
         rt AS (SELECT source,
                       CASE WHEN n_tokens > 0
                            THEN CAST(target_tokens AS DOUBLE)
                                 / CAST(n_tokens AS DOUBLE)
                            ELSE 0.0 END AS rate
                FROM sel),
         ex AS (SELECT d.source, d.doc_id,
                       CAST(floor(rate) AS BIGINT)
                         + CASE WHEN ${Md5Bucket.bucketSql("epoch",
                             "CAST(d.doc_id AS VARCHAR)", 65536)}
                                  < CAST(floor((rate - floor(rate))
                                      * 65536) AS BIGINT)
                                THEN 1 ELSE 0 END AS n_emit
                FROM documents d JOIN rt ON d.source = rt.source)
         SELECT source, doc_id,
                unnest(range(0, n_emit)) AS epoch
         FROM ex
         ORDER BY source, doc_id, epoch""")
  )
}

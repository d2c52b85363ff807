package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.Bpe

/** Subword-tokenization conformance queries: the pinned-merge BPE
  * tokenizer ([[graft.text.Bpe]]) exercised end-to-end over the
  * documents corpus, with DuckDB oracles GENERATED from the same frozen
  * merge table the engine folds over — one table, two renderings, no
  * drift surface.
  *
  * Scale notes: every query here is a single projection over the
  * corpus scan (the replace chain is per-row, codegen, no shuffle);
  * the vocabulary top-k plans as partial-agg → TakeOrdered, never a
  * global sort.
  */
object TokenOps extends QueryModule {

  // NULL text ≡ empty doc (0 subwords), normalized at the seam in both
  // renderings — same convention as the curation corpus.
  private val textC = coalesce(col("text"), lit(""))

  // Full per-document tokenization: count + the token stream itself
  // (joined by ' '), so the conformance hash pins token IDENTITY and
  // ORDER, not just arithmetic.
  private def textTokensBpe(s: SparkSession, d: String): DataFrame = {
    val toks = Bpe.tokens(textC)
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(toks).as("n_subwords"),
        array_join(toks, " ").as("subwords"))
      .orderBy("doc_id")
  }

  // Corpus subword vocabulary, top 50 by frequency (ties broken by
  // token) — explode → partial-agg count → TakeOrderedAndProject.
  private def vocabBpeTopk(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(Bpe.tokens(textC)).as("subword"))
      .groupBy("subword").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("subword"))
      .limit(50)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_tokens_bpe" -> (textTokensBpe _),
    "vocab_bpe_topk"  -> (vocabBpeTopk _)
  )

  val oracles: Map[String, String] = Map(
    "text_tokens_bpe" ->
      s"""SELECT doc_id,
                 ${Bpe.oracleNTokensExpr("coalesce(text, '')")} AS n_subwords,
                 array_to_string(${Bpe.oracleTokensExpr("coalesce(text, '')")}, ' ')
                   AS subwords
          FROM documents ORDER BY doc_id""",

    "vocab_bpe_topk" ->
      s"""SELECT subword, CAST(count(*) AS BIGINT) AS n
          FROM (SELECT unnest(${Bpe.oracleTokensExpr("coalesce(text, '')")}) AS subword
                FROM documents)
          GROUP BY subword
          ORDER BY n DESC, subword LIMIT 50"""
  )
}

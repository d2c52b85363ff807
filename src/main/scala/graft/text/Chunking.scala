package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking with overlap — the RAG / pretraining shard-prep
  * step that splits a long document into fixed-token windows with a
  * stride (overlap = window − stride), keeping character offsets so a
  * chunk can be traced back into its source. The record-decomposition
  * sibling of the reference's block splitting
  * (knightshift `get_games_from_tv.py:182-199` splits a PGN stream
  * into game records; this splits a document into training windows),
  * applied to the `documents` corpus ahead of
  * [[Packing.packSequences]].
  *
  * Windowing rule (the standard sliding-window tokenizer shape):
  * starts at 0, stride, 2·stride, …; the LAST window is the first one
  * reaching the end (start + window ≥ n) and may be short; later
  * starts would be strict suffixes of it and are not emitted. Every
  * token is covered; consecutive chunks share window − stride tokens.
  *
  * Offsets index the canonical single-space join of the token stream
  * (the same normalization every downstream consumer of the token
  * array sees): char_start of a chunk starting at token s is
  * Σ_{i<s} len(tᵢ) + s. All arithmetic is integer, so the operator is
  * DuckDB-oracle-exact end to end, chunk text included.
  *
  * Scale shape (100 TB): NO shuffle — tokenize, window enumeration
  * (sequence + explode) and slicing are per-row projections; output
  * partitioning inherits the scan. Per-doc cost is O(n·W/S) output
  * text (inherent) + O(n²/S) integer adds for prefix lengths — for
  * real document sizes the string output dominates. Compose with
  * [[Packing.packSequences]] on (doc, chunk) keys for binning.
  */
object Chunking {

  /** One row per (doc, window): (idCol, chunk_idx, tok_start, tok_end,
    * n_chunk_tokens, char_start, char_len, chunk_text) with tok_end
    * exclusive. Docs with zero tokens emit no chunks. */
  def chunkOverlap(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0, "window must be positive")
    require(stride > 0 && stride <= window,
      "stride must be in [1, window] — a gap would drop tokens")
    val ts: Column = filter(TextAnalysis.tokens(col(textCol)),
      w => length(w) > 0)
    df.select(col(idCol), ts.as("__ts"))
      .withColumn("__n", size(col("__ts")))
      .filter(col("__n") > 0)
      // first start reaching the end, inclusive: 1 + ceil((n−W)/S)
      .withColumn("__nc", when(col("__n") <= window, lit(1))
        .otherwise(expr(
          s"cast(1 + (__n - $window + $stride - 1) div $stride as int)")))
      .withColumn("chunk_idx",
        explode(sequence(lit(0), col("__nc") - 1)))
      .withColumn("tok_start", col("chunk_idx") * stride)
      .withColumn("tok_end",
        least(col("tok_start") + window, col("__n")))
      .withColumn("chunk_text", array_join(
        slice(col("__ts"), col("tok_start") + 1,
          col("tok_end") - col("tok_start")), " "))
      .withColumn("n_chunk_tokens", col("tok_end") - col("tok_start"))
      // position of token s in the single-space join: Σ_{i<s} len + s
      .withColumn("char_start", when(col("tok_start") === 0, lit(0))
        .otherwise(aggregate(
          slice(col("__ts"), lit(1), col("tok_start")), lit(0),
          (acc, x) => acc + length(x)) + col("tok_start")))
      .withColumn("char_len", length(col("chunk_text")))
      .select(col(idCol), col("chunk_idx"), col("tok_start"),
        col("tok_end"), col("n_chunk_tokens"), col("char_start"),
        col("char_len"), col("chunk_text"))
  }
}

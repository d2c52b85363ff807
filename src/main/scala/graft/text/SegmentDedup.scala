package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Segment-level exact deduplication — the C4 / RefinedWeb "drop
  * repeated lines/paragraphs across the corpus" pass. The corpus-wide
  * unit of dedup is a fixed-width word segment (a stand-in for a
  * paragraph boundary: the synthetic corpus has no newlines, and a
  * fixed width keeps the rule deterministic and oracle-checkable; a
  * real corpus would pass `segWords = Int.MaxValue` per newline-split
  * paragraph instead).
  *
  * Keep rule: a segment occurrence survives iff it is the FIRST
  * occurrence of that exact segment text in the corpus, ordered by
  * (doc_id, seg_idx). Every later copy — in another document or later
  * in the same document — is dropped, and each document is reassembled
  * from its surviving segments in original order.
  *
  * Scale shape (100 TB): segment → keeper is a groupBy on the segment
  * text (partial aggregation combines map-side, so a hot segment — a
  * boilerplate header repeated across millions of pages — reduces to
  * one row per map task before the shuffle; no per-key sort, no skew
  * window). The keeper join re-shuffles on the same segment key, and
  * reassembly is one groupBy on doc_id. Three hash shuffles total,
  * all key-sharded, nothing driver-side.
  */
object SegmentDedup {

  /** Explode documents into (doc_id, seg_idx, segment) rows:
    * non-overlapping `segWords`-word windows over the whitespace
    * tokenization (case-preserving — exact dedup is byte-exact).
    * Empty documents produce no segments. */
  def segments(df: DataFrame, idCol: String, textCol: String,
      segWords: Int): DataFrame = {
    require(segWords > 0, "segWords must be positive")
    val ts = Tokens.ws(textCol)
    val n = size(col("__ts"))
    val nSeg = ceil(n.cast("double") / segWords).cast("int")
    df.select(col(idCol).as("doc_id"), ts.as("__ts"))
      .select(col("doc_id"),
        posexplode(when(n > 0,
          transform(sequence(lit(0), nSeg - 1), i =>
            array_join(slice(col("__ts"), i * segWords + 1, lit(segWords)),
              " ")))
          .otherwise(array().cast("array<string>"))))
      .withColumnRenamed("pos", "seg_idx")
      .withColumnRenamed("col", "segment")
  }

  /** Corpus-wide first-occurrence dedup + reassembly:
    * (doc_id, clean_text, n_segments, n_kept, n_dropped), one row per
    * document that had at least one segment. A document whose every
    * segment was seen earlier (an exact duplicate) survives with
    * clean_text = '' and n_kept = 0 — the caller drops or keeps those
    * husks by policy. */
  def dedupSegments(df: DataFrame, idCol: String, textCol: String,
      segWords: Int, hashKeys: Boolean = false): DataFrame = {
    val segs = segments(df, idCol, textCol, segWords)
    // Production key (hashKeys=true): (xxhash64(segment), length) — the
    // keeper AGGREGATION shuffles ~16-byte keys instead of segment
    // text (its map-side partial output is per-distinct-segment, so
    // this is the corpus-sized stage), and the keeper table itself
    // shrinks to key+(doc,idx) rows — the same prehash trick the
    // exact-dedup path documents. (The keeper JOIN still carries text
    // once: reassembly needs it in the output either way.) A 64-bit
    // collision (birthday-bounded by the corpus segment count) would
    // wrongly drop a non-duplicate segment — acceptable for curation,
    // NOT for the conformance oracle, which keys on text (default).
    val keyed = segs.withColumn("__k",
      if (hashKeys) struct(xxhash64(col("segment")), length(col("segment")))
      else struct(col("segment")))
    // arg-min by aggregation, not a window: min(struct) keeps partial
    // aggregation (map-side combine) so a corpus-dominating boilerplate
    // segment never concentrates a sort on one task
    // keeper columns all renamed: keeper derives from segs, so a
    // same-name join condition would hit ambiguous-self-join resolution
    val keeper = keyed.groupBy("__k")
      .agg(min(struct(col("doc_id"), col("seg_idx"))).as("__keep"))
      .select(col("__k").as("__kk"), col("__keep.doc_id").as("__kdoc"),
        col("__keep.seg_idx").as("__kidx"))
    val kept = keyed.join(keeper,
      col("__k") === col("__kk") &&
        col("doc_id") === col("__kdoc") && col("seg_idx") === col("__kidx"))
      .select(col("doc_id"), col("seg_idx"), col("segment"))
    val reassembled = kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("seg_idx"), col("segment")))),
          s => s("segment")), " ").as("clean_text"))
    segs.groupBy("doc_id").agg(count(lit(1)).as("n_segments"))
      .join(reassembled, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_segments").cast("int").as("n_segments"),
        coalesce(col("n_kept"), lit(0L)).cast("int").as("n_kept"),
        (col("n_segments") -
          coalesce(col("n_kept"), lit(0L))).cast("int").as("n_dropped"))
  }
}

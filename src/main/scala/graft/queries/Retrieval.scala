package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.{Packing, TextAnalysis}

/** Retrieval + shard-prep tier (split from TrainPrep): BM25 keyword
  * retrieval (production ln scorer + the hash-provable pinned twin),
  * hybrid lexical/semantic fusion, distinctive terms (integer-exact
  * tf-idf ranking), overlapping chunking, and the chunk→pack
  * composition.
  *
  * Every entry is oracle-paired where IEEE semantics allow: integer
  * arithmetic, md5-hash thresholds, or correctly-rounded operations
  * (+ − × ÷ sqrt), so DuckDB reproduces the result bit-for-bit; the
  * two `ln`-bearing production scorers are rows-only with pinned
  * hash-green twins (see SURVEY.md §2.8 notes).
  */
object Retrieval extends QueryModule {

  // One term list for every BM25 entry AND the generated oracle SQL —
  // a drifted literal would silently compare different queries.
  private[queries] val Bm25Terms = Seq("spark", "window", "vector")

  // BM25 keyword retrieval (rows-only: ln is not correctly-rounded
  // cross-engine; Bm25Spec pins a hand-computed score and the ranking
  // contract; text_bm25_pinned hash-anchors the shared pipeline).
  // Query terms are mid-frequency corpus vocabulary.
  private def textBm25Topk(s: SparkSession, d: String): DataFrame =
    graft.text.Bm25.bm25TopK(Tables.documents(s, d), "doc_id", "text",
      Bm25Terms, k = 20)

  // Hybrid retrieval: BM25 lexical top-20 fused with the cosine
  // semantic top-20 of query vector 0 (doc_id ≡ vec_id) by
  // reciprocal-rank fusion. Rows-only (the BM25 side carries ln);
  // Bm25Spec pins the fusion arithmetic on hand-built lists.
  private def retrievalHybridRrf(s: SparkSession, d: String): DataFrame = {
    val lexical = graft.text.Bm25
      .bm25TopK(Tables.documents(s, d), "doc_id", "text",
        Bm25Terms, k = 20)
      .select(col("doc_id"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(desc("score"), asc("doc_id"))).as("rank"))
    val semantic = graft.sim.Similarity
      .bruteForceTopK(Tables.embeddings(s, d), col("vec_id") === 0, k = 20)
      .select(col("cand_id").as("doc_id"), col("rank"))
    graft.sim.Hybrid.rrfFuse(lexical, semantic, "doc_id", k = 10)
  }

  // Hash-provable BM25 twin: same pipeline as text_bm25_topk (shared
  // tokenize/postings/tf/df/len/avgdl/saturation/fold/top-k code path)
  // with the rational-odds idf — `ln` is the ONE BM25 op IEEE leaves
  // unrounded cross-engine; everything else is correctly-rounded
  // + − × ÷, so the DuckDB oracle matches bit-for-bit and this entry
  // hash-anchors the production scorer's whole plumbing.
  private def textBm25Pinned(s: SparkSession, d: String): DataFrame =
    graft.text.Bm25.bm25PinnedTopK(Tables.documents(s, d), "doc_id",
      "text", Bm25Terms, k = 20)

  // RRF fusion over two hash-proven inputs: the pinned BM25 ranking
  // above and the exact cosine top-20 of query vector 0 (the
  // sim_cosine_topk oracle's arithmetic). The fusion itself is two
  // exact divisions + one fixed-order sum — hash-checkable end-to-end,
  // anchoring Hybrid.rrfFuse (the same code retrieval_hybrid_rrf runs).
  private def retrievalHybridRrfPinned(s: SparkSession, d: String)
      : DataFrame = {
    val lexical = graft.text.Bm25
      .bm25PinnedTopK(Tables.documents(s, d), "doc_id", "text",
        Bm25Terms, k = 20)
      .select(col("doc_id"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(desc("score"), asc("doc_id"))).as("rank"))
    val semantic = graft.sim.Similarity
      .bruteForceTopK(Tables.embeddings(s, d), col("vec_id") === 0, k = 20)
      .select(col("cand_id").as("doc_id"), col("rank"))
    graft.sim.Hybrid.rrfFuse(lexical, semantic, "doc_id", k = 10)
  }

  private def textTfidfTopk(s: SparkSession, d: String): DataFrame =
    TextAnalysis.distinctiveTerms(Tables.documents(s, d), "doc_id", k = 3)
      .orderBy("doc_id", "rank")

  // Overlapping chunking at window 64 / stride 48 (16-token overlap):
  // integer windowing + canonical-join char offsets, fully
  // DuckDB-expressible including the chunk text itself.
  private def textChunkOverlap(s: SparkSession, d: String): DataFrame =
    graft.text.Chunking.chunkOverlap(Tables.documents(s, d), "doc_id",
        "text", window = 64, stride = 48)
      .orderBy("doc_id", "chunk_idx")

  // Chunk → pack composition: the chunker's output keyed by
  // (doc, chunk) flows straight into sequence packing — the
  // shard-prep pipeline end-to-end, hash-proven as ONE query (the
  // chunk text/boundaries AND the bin assignments must both match).
  private def pipelineChunkPack(s: SparkSession, d: String): DataFrame = {
    val chunks = graft.text.Chunking
      .chunkOverlap(Tables.documents(s, d), "doc_id", "text",
        window = 64, stride = 48)
      .select(concat(col("doc_id").cast("string"), lit("_"),
          col("chunk_idx").cast("string")).as("chunk_id"),
        col("n_chunk_tokens"))
    Packing.packSequences(chunks, "chunk_id", "n_chunk_tokens",
        budget = 512)
      .select(col("chunk_id"), col("n_chunk_tokens"), col("bucket"),
        col("offset").as("tok_offset"), col("bin_id"))
      .orderBy("chunk_id")
  }

  // Chunk-level retrieval with provenance — the RAG shape: BM25 over
  // the CHUNK corpus (same pinned scorer, so the whole composition is
  // hash-provable), each hit carrying its source doc, chunk index and
  // char offset for traceback into the original text.
  private def textBm25Chunks(s: SparkSession, d: String): DataFrame = {
    val chunks = graft.text.Chunking
      .chunkOverlap(Tables.documents(s, d), "doc_id", "text",
        window = 64, stride = 48)
      .select(concat(col("doc_id").cast("string"), lit("_"),
          col("chunk_idx").cast("string")).as("chunk_id"),
        col("doc_id").as("src_doc_id"), col("chunk_idx"),
        col("char_start"), col("chunk_text"))
    graft.text.Bm25
      .bm25PinnedTopK(chunks, "chunk_id", "chunk_text", Bm25Terms, k = 20)
      .join(chunks.select(col("chunk_id").as("doc_id"),
        col("src_doc_id"), col("chunk_idx"), col("char_start")),
        Seq("doc_id"))
      .orderBy(desc("score"), asc("doc_id"))
  }

  // ---- SFT packing with loss masks: the instruction-tuning shard
  //      shape — (prompt, completion) pairs tokenized with the REAL
  //      subword tokenizer ([[graft.text.Bpe]]), packed under the
  //      512-token budget (salt 'sft' — independent of the pretrain
  //      pack), each example carrying its loss-mask span
  //      [offset+n_prompt, offset+n_tokens): completion tokens train,
  //      prompt tokens don't. All integer arithmetic — hash-exact.
  private def packSft(s: SparkSession, d: String): DataFrame = {
    import graft.text.Bpe
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        Bpe.nTokens(concat(lit("q: "), coalesce(col("text"), lit(""))))
          .as("n_prompt"),
        Bpe.nTokens(concat(lit("a: "), coalesce(col("source"), lit("")),
          lit(" "), coalesce(col("lang"), lit("")))).as("n_completion"))
      .withColumn("n_tokens", col("n_prompt") + col("n_completion"))
    Packing.packSequences(docs, "doc_id", "n_tokens", budget = 512,
        salt = "sft")
      .select(col("doc_id"), col("n_prompt"), col("n_completion"),
        col("bucket"), col("offset").as("tok_offset"), col("bin_id"),
        (col("offset") + col("n_prompt")).as("mask_start"),
        (col("offset") + col("n_tokens")).as("mask_end"))
      .orderBy("doc_id")
  }

  // DPO/RLHF preference-pair construction: documents bucketed into
  // prompt groups (md5 of doc_id — the stand-in for a real prompt id,
  // same seam as the classifier's stand-in weights), and within each
  // group the quality-classifier argmax becomes `chosen`, the argmin
  // `rejected` (ties to the lower doc_id); zero-margin groups drop —
  // a preference pair needs an actual preference. Composes two
  // hash-proven pieces: text_classifier_score's integer scorer and
  // Md5Bucket's engine-portable grouping.
  //
  // Scale shape: ONE corpus scan and one shuffle on prompt_id — both
  // extremes fold as struct-ordered min/max partial aggregates (the
  // arg-max-by-(score, tiebreak) trick), so the shuffle carries two
  // structs per (task, prompt) however many completions a prompt has.
  // No window, no self-join, no second derivation of the input.
  private def packDpoPairs(s: SparkSession, d: String): DataFrame = {
    val scored = graft.text.LinearClassifier
      .score(Tables.documents(s, d), "doc_id", "text")
      .select(col("doc_id"), col("score"),
        graft.functions.Md5Bucket.bucket("dpo",
          col("doc_id").cast("string"), 64).as("prompt_id"))
    // chosen = (score desc, doc_id asc) argmax → max(score, −doc_id);
    // rejected = (score asc, doc_id asc) argmin → min(score, doc_id)
    scored.groupBy("prompt_id").agg(
        max(struct(col("score"), (-col("doc_id")).as("neg"))).as("ch"),
        min(struct(col("score"), col("doc_id"))).as("rj"))
      .select(col("prompt_id"),
        (-col("ch.neg")).as("chosen_id"),
        col("ch.score").as("chosen_score"),
        col("rj.doc_id").as("rejected_id"),
        col("rj.score").as("rejected_score"))
      .filter(col("chosen_score") > col("rejected_score"))
      .withColumn("margin", col("chosen_score") - col("rejected_score"))
      .orderBy("prompt_id")
  }

  // ---- Anchor-text relevance: the classic web-retrieval signal
  //      (anchor TERMS describe the TARGET document — Craswell,
  //      Hawking & Robertson 2001): per-doc markup → (href, anchor
  //      text) extraction (HtmlOps.anchors, the real regex chain) →
  //      canonical target (UrlOps — the %3/%7 variants MUST converge)
  //      → anchor pseudo-doc per target (all anchor texts pointing at
  //      it, concatenated in (src doc, href) order) → the SAME pinned
  //      BM25 scorer that ranks real documents, run over the
  //      pseudo-doc corpus. Anchor texts are token slices of the
  //      source doc (first/3rd/5th 4-gram per link class), so the
  //      oracle synthesizes the identical link set from the formulas
  //      and hash equality proves extract∘canonicalize∘aggregate∘rank
  //      end to end.
  //
  //      Scale shape: extraction is a projection; the pseudo-doc
  //      aggregation shuffles ANCHORS (tiny rows), never documents;
  //      the BM25 stage then runs over one row per target — the
  //      classic "anchor corpus is smaller than the doc corpus"
  //      asymmetry that made anchor text cheap to serve. Hub-target
  //      skew (a celebrity URL's in-degree is corpus-scale) bounds at
  //      production by a deterministic per-target anchor sample —
  //      keep the md5-lowest N anchors per target (the Sampling
  //      fixed-N rule on (canon_url, src, href)) BEFORE the concat;
  //      the synthesis here caps in-degree at corpus/50 by
  //      construction, so the conformance entry needs no cap.
  private def webAnchorBm25(s: SparkSession, d: String): DataFrame = {
    // tokenize COALESCED text: a null doc text must yield empty anchor
    // slices (matching the oracle's NULL-atext anchor rows), not
    // null-poison the whole concat'd html and drop the doc's anchors
    val ts = graft.text.Tokens.ws(coalesce(col("text"), lit("")))
    val a1 = array_join(slice(ts, 1, 4), " ")
    val a2 = array_join(slice(ts, 3, 4), " ")
    val a3 = array_join(slice(ts, 5, 4), " ")
    val tgt = (col("doc_id") % 50).cast("string")
    val html = concat(
      lit("<html><body><p>"), coalesce(col("text"), lit("")), lit("</p>"),
      when(col("doc_id") % 3 === 0,
        concat(lit("<a href=\"https://example.org/p"), tgt,
          lit("\">"), a1, lit("</a>"))).otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        concat(lit("<a href=\"https://Example.ORG/p"), tgt,
          lit("?utm_source=x\">"), a2, lit("</a>"))).otherwise(lit("")),
      when(col("doc_id") % 11 === 0,
        concat(lit("<a href=\"https://example.org/p"), tgt,
          lit("?page=2\">"), a3, lit("</a>"))).otherwise(lit("")),
      lit("</body></html>"))
    val pairs = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(graft.text.HtmlOps.anchors(html)).as("a"))
      .select(col("doc_id"), col("a.href").as("url"),
        col("a.atext").as("atext"))
    val pseudo = graft.text.UrlOps.canonicalize(pairs)
      .groupBy("canon_url")
      .agg(count(lit(1)).as("n_anchors"),
        concat_ws(" ", transform(
          array_sort(collect_list(
            struct(col("doc_id"), col("url"), col("atext")))),
          x => x.getField("atext"))).as("anchor_text"))
    graft.text.Bm25.bm25PinnedTopK(pseudo, "canon_url", "anchor_text",
        Bm25Terms, k = 20)
      .join(pseudo.select(col("canon_url").as("doc_id"),
        col("n_anchors")), Seq("doc_id"))
      .orderBy(desc("score"), asc("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "web_anchor_bm25" -> (webAnchorBm25 _),
    "pack_dpo_pairs" -> (packDpoPairs _),
    "text_bm25_topk" -> (textBm25Topk _),
    "retrieval_hybrid_rrf" -> (retrievalHybridRrf _),
    "text_bm25_pinned" -> (textBm25Pinned _),
    "retrieval_hybrid_rrf_pinned" -> (retrievalHybridRrfPinned _),
    "text_tfidf_topk" -> (textTfidfTopk _),
    "text_chunk_overlap" -> (textChunkOverlap _),
    "pipeline_chunk_pack" -> (pipelineChunkPack _),
    "text_bm25_chunks" -> (textBm25Chunks _),
    "pack_sft" -> (packSft _),
  )

  // ts mirrors TextAnalysis.tokens (lowercased ' +' split).
  private val tokCte =
    """tok AS (
         SELECT doc_id,
                list_filter(string_split(lower(trim(text)), ' '),
                            t -> t <> '') AS ts
         FROM documents
       )"""

  /** Shared CTE chain for the pinned-BM25 oracles: mirrors
    * [[graft.text.Bm25]] operand-for-operand (same association order in
    * every product/division — IEEE rounding is order-sensitive), with
    * fractional literals CAST to DOUBLE (a bare `0.5` is DECIMAL in
    * DuckDB and decimal arithmetic would diverge from Spark's doubles).
    * `list_reduce` over `list(w ORDER BY term)` reproduces the
    * term-order fold (0.0 + w₁ ≡ w₁ for the positive weights here). */
  private def bm25PinnedChain(src: String): String =
    s"""lens AS (SELECT doc_id, CAST(len(ts) AS INT) AS len FROM $src),
       st AS (SELECT count(*) AS n_docs,
                     CAST(sum(len) AS DOUBLE) / count(*) AS avgdl
              FROM lens),
       tt AS (SELECT doc_id, unnest(ts) AS term FROM $src),
       tf AS (SELECT doc_id, term, count(*) AS tf FROM tt
              WHERE term IN (${Bm25Terms.map(t => s"'$t'").mkString(", ")})
              GROUP BY doc_id, term),
       dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       wts AS (SELECT tf.doc_id, tf.term,
                      ((st.n_docs - dfq.df + CAST(0.5 AS DOUBLE))
                        / (dfq.df + CAST(0.5 AS DOUBLE)))
                      * (tf.tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
                      / (tf.tf + CAST(1.2 AS DOUBLE) *
                         (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
                          + CAST(0.75 AS DOUBLE) * lens.len / st.avgdl))
                        AS w
               FROM tf JOIN dfq USING (term) JOIN lens USING (doc_id), st),
       bm AS (SELECT doc_id,
                     list_reduce(list(w ORDER BY term), (a, b) -> a + b)
                       AS score,
                     count(*) AS n_terms_hit
              FROM wts GROUP BY doc_id
              ORDER BY score DESC, doc_id LIMIT 20)"""

  private lazy val bm25PinnedCte: String = bm25PinnedChain("tok")

  /** Chunk windows at 64/48 as a reusable CTE chain ending in `c2`
    * (doc_id, ts, n, chunk_idx, tok_start, tok_end) — shared by the
    * chunk entry and the chunk→pack composition so the windowing rule
    * cannot drift between them. */
  private lazy val chunkCte: String =
    """base AS (SELECT doc_id, ts, CAST(len(ts) AS INT) AS n,
                       CASE WHEN len(ts) <= 64 THEN 1
                            ELSE CAST(1 + (len(ts) - 64 + 47) // 48
                                      AS INT) END AS nc
                FROM tok WHERE len(ts) > 0),
       ch AS (SELECT doc_id, ts, n,
                     unnest([i for i in range(nc)]) AS k
              FROM base),
       c2 AS (SELECT doc_id, ts, n, CAST(k AS INT) AS chunk_idx,
                     CAST(k * 48 AS INT) AS tok_start,
                     CAST(least(k * 48 + 64, n) AS INT) AS tok_end
              FROM ch)"""

  val oracles: Map[String, String] = Map(
    // link set + anchor texts synthesized directly from the formulas
    // (extraction itself is proven by text_html_extract /
    // HtmlOpsSpec); canonicalization is the urlCanonChain rule; the
    // ranking is the shared pinned-BM25 chain over anchor pseudo-docs
    "web_anchor_bm25" ->
      (s"""WITH tkr AS (
           SELECT doc_id,
                  list_filter(string_split(trim(text), ' '),
                              t -> t <> '') AS tsr
           FROM documents),
         u AS (
           SELECT doc_id,
                  'https://example.org/p' || CAST(doc_id % 50 AS VARCHAR)
                    AS url,
                  array_to_string(tsr[1:4], ' ') AS atext
           FROM tkr WHERE doc_id % 3 = 0
           UNION ALL
           SELECT doc_id,
                  'https://Example.ORG/p' || CAST(doc_id % 50 AS VARCHAR)
                    || '?utm_source=x' AS url,
                  array_to_string(tsr[3:6], ' ') AS atext
           FROM tkr WHERE doc_id % 7 = 0
           UNION ALL
           SELECT doc_id,
                  'https://example.org/p' || CAST(doc_id % 50 AS VARCHAR)
                    || '?page=2' AS url,
                  array_to_string(tsr[5:8], ' ') AS atext
           FROM tkr WHERE doc_id % 11 = 0),
         ${TrainPrep.urlCanonChain},
         ap AS (SELECT c.canon_url, c.doc_id, c.url, u.atext
                FROM c JOIN u ON u.doc_id = c.doc_id AND u.url = c.url),
         pd AS (SELECT canon_url, count(*) AS n_anchors,
                       array_to_string(
                         list(atext ORDER BY doc_id, url, atext), ' ')
                         AS atxt
                FROM ap GROUP BY canon_url),
         ptok AS (SELECT canon_url AS doc_id,
                         list_filter(
                           string_split(lower(trim(atxt)), ' '),
                           t -> t <> '') AS ts
                  FROM pd),
         ${bm25PinnedChain("ptok")}
         SELECT bm.doc_id, bm.score, bm.n_terms_hit, pd.n_anchors
         FROM bm JOIN pd ON pd.canon_url = bm.doc_id
         ORDER BY bm.score DESC, bm.doc_id"""),

    // classifier scorer (weightSql) + md5 prompt bucket + two window
    // ranks — every operand BIGINT, so the pair set is bit-exact
    "pack_dpo_pairs" -> {
      import graft.text.LinearClassifier
      s"""WITH tk AS (
           SELECT doc_id,
                  list_filter(string_split(trim(text), ' '), t -> t <> '')
                    AS ts
           FROM documents
         ),
         sc AS (
           SELECT doc_id,
                  CAST(coalesce(list_sum(
                    [${LinearClassifier.weightSql("u:", "t")}
                     for t in ts]), 0) AS BIGINT)
                  + CAST(coalesce(list_sum(
                    [${LinearClassifier.weightSql("b:",
                        "ts[i] || ' ' || ts[i+1]")}
                     for i in range(1, len(ts))]), 0) AS BIGINT) AS score,
                  ${graft.functions.Md5Bucket.bucketSql("dpo",
                      "CAST(doc_id AS VARCHAR)", 64)} AS prompt_id
           FROM tk
         ),
         rk AS (
           SELECT prompt_id, doc_id, score,
                  row_number() OVER (PARTITION BY prompt_id
                    ORDER BY score DESC, doc_id) AS rb,
                  row_number() OVER (PARTITION BY prompt_id
                    ORDER BY score ASC, doc_id) AS rw
           FROM sc
         ),
         ch AS (SELECT prompt_id, doc_id AS chosen_id,
                       score AS chosen_score FROM rk WHERE rb = 1),
         rj AS (SELECT prompt_id, doc_id AS rejected_id,
                       score AS rejected_score FROM rk WHERE rw = 1)
         SELECT prompt_id, ch.chosen_id, ch.chosen_score,
                rj.rejected_id, rj.rejected_score,
                ch.chosen_score - rj.rejected_score AS margin
         FROM ch JOIN rj USING (prompt_id)
         WHERE ch.chosen_score > rj.rejected_score
         ORDER BY prompt_id"""
    },

    // the Bpe token chains are generated from the SAME frozen merge
    // table; the cumsum/bin/mask arithmetic is all BIGINT-exact
    "pack_sft" -> {
      import graft.text.Bpe
      val np = Bpe.oracleNTokensExpr("'q: ' || coalesce(text, '')")
      val nc = Bpe.oracleNTokensExpr(
        "'a: ' || coalesce(source, '') || ' ' || coalesce(lang, '')")
      s"""WITH n AS (
           SELECT doc_id, $np AS n_prompt, $nc AS n_completion,
                  md5('sft' || CAST(doc_id AS VARCHAR)) AS h
           FROM documents),
         n2 AS (SELECT *, n_prompt + n_completion AS n_tokens FROM n),
         p AS (SELECT doc_id, n_prompt, n_completion, n_tokens,
                      substr(h, 1, 2) AS bucket,
                      sum(CAST(n_tokens AS BIGINT)) OVER (
                        PARTITION BY substr(h, 1, 2) ORDER BY h, doc_id
                        ROWS UNBOUNDED PRECEDING) - n_tokens
                        AS tok_offset
               FROM n2)
         SELECT doc_id, n_prompt, n_completion, bucket,
                CAST(tok_offset AS BIGINT) AS tok_offset,
                CAST(tok_offset // 512 AS BIGINT) AS bin_id,
                CAST(tok_offset + n_prompt AS BIGINT) AS mask_start,
                CAST(tok_offset + n_tokens AS BIGINT) AS mask_end
         FROM p ORDER BY doc_id"""
    },

    "pipeline_chunk_pack" ->
      (s"""WITH $tokCte, $chunkCte,
          cn AS (SELECT CAST(doc_id AS VARCHAR) || '_' ||
                          CAST(chunk_idx AS VARCHAR) AS chunk_id,
                        tok_end - tok_start AS n_chunk_tokens
                 FROM c2),
          nn AS (SELECT chunk_id, n_chunk_tokens,
                        md5('pack' || chunk_id) AS h
                 FROM cn),
          p AS (SELECT chunk_id, n_chunk_tokens,
                       substr(h, 1, 2) AS bucket,
                       sum(CAST(n_chunk_tokens AS BIGINT)) OVER (
                         PARTITION BY substr(h, 1, 2)
                         ORDER BY h, chunk_id
                         ROWS UNBOUNDED PRECEDING) - n_chunk_tokens
                         AS tok_offset
                FROM nn)
          SELECT chunk_id, n_chunk_tokens, bucket,
                 CAST(tok_offset AS BIGINT) AS tok_offset,
                 CAST(tok_offset // 512 AS BIGINT) AS bin_id
          FROM p ORDER BY chunk_id"""),

    "text_bm25_pinned" ->
      (s"""WITH $tokCte, $bm25PinnedCte
          SELECT doc_id, score, n_terms_hit FROM bm
          ORDER BY score DESC, doc_id"""),

    // the SAME pinned chain run over the chunk corpus (ctok maps each
    // chunk's token slice to the chain's (doc_id, ts) contract); the
    // provenance join re-derives src/idx/offset from the chunk CTE
    "text_bm25_chunks" ->
      (s"""WITH $tokCte, $chunkCte,
          cn AS (SELECT CAST(doc_id AS VARCHAR) || '_' ||
                          CAST(chunk_idx AS VARCHAR) AS chunk_id,
                        doc_id AS src_doc_id, chunk_idx,
                        CAST(CASE WHEN tok_start = 0 THEN 0
                             ELSE list_reduce(list_transform(
                                    ts[1:tok_start], t -> length(t)),
                                    (a, b) -> a + b) + tok_start END
                             AS INT) AS char_start,
                        ts[tok_start+1:tok_end] AS cts
                 FROM c2),
          ctok AS (SELECT chunk_id AS doc_id, cts AS ts FROM cn),
          ${bm25PinnedChain("ctok")}
          SELECT bm.doc_id, bm.score, bm.n_terms_hit,
                 cn.src_doc_id, cn.chunk_idx, cn.char_start
          FROM bm JOIN cn ON cn.chunk_id = bm.doc_id
          ORDER BY bm.score DESC, bm.doc_id"""),

    // fusion arithmetic: two exact int→double divisions + one
    // fixed-order two-addend sum — identical in both engines; the
    // cosine side is the sim_cosine_topk oracle restricted to query 0
    "retrieval_hybrid_rrf_pinned" ->
      (s"""WITH $tokCte, $bm25PinnedCte,
          lex AS (SELECT doc_id,
                         CAST(row_number() OVER
                           (ORDER BY score DESC, doc_id) AS INT) AS rank_a
                  FROM bm),
          v AS (SELECT vec_id, embedding::DOUBLE[] AS vd FROM embeddings),
          nv AS (SELECT vec_id, vd,
                        sqrt(list_reduce(
                          list_transform(vd, (x, i) -> x * vd[i]),
                          (a, b) -> a + b)) AS nrm
                 FROM v),
          sc AS (SELECT c.vec_id AS doc_id,
                        list_reduce(
                          list_transform(q.vd, (x, i) -> x * c.vd[i]),
                          (p, s2) -> p + s2) / (q.nrm * c.nrm) AS cosine
                 FROM nv q JOIN nv c ON q.vec_id <> c.vec_id
                 WHERE q.vec_id = 0),
          sem AS (SELECT doc_id, CAST(rn AS INT) AS rank_b
                  FROM (SELECT doc_id, row_number() OVER
                          (ORDER BY cosine DESC, doc_id) AS rn
                        FROM sc)
                  WHERE rn <= 20),
          fused AS (SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
                           rank_a, rank_b,
                           coalesce(CAST(1.0 AS DOUBLE) / (60 + rank_a),
                                    CAST(0.0 AS DOUBLE)) +
                           coalesce(CAST(1.0 AS DOUBLE) / (60 + rank_b),
                                    CAST(0.0 AS DOUBLE)) AS rrf_score
                    FROM lex FULL OUTER JOIN sem
                      ON lex.doc_id = sem.doc_id)
          SELECT doc_id, rrf_score, rank_a, rank_b
          FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 10"""),

    "text_tfidf_topk" ->
      (s"""WITH $tokCte,
          t AS (SELECT doc_id, unnest(ts) AS term FROM tok),
          tf AS (SELECT doc_id, term, count(*) AS tf
                 FROM t GROUP BY doc_id, term),
          dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
          SELECT doc_id, rank, term, tf, df FROM (
            SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
                   CAST(row_number() OVER (
                     PARTITION BY tf.doc_id
                     ORDER BY tf.tf DESC, dfq.df ASC, tf.term ASC) AS INT)
                     AS rank
            FROM tf JOIN dfq USING (term))
          WHERE rank <= 3
          ORDER BY doc_id, rank"""),

    // windowing rule mirrored with integer arithmetic; slices are
    // 1-based inclusive in DuckDB (ts[s+1 : e] = tokens s..e−1)
    "text_chunk_overlap" ->
      (s"""WITH $tokCte, $chunkCte
          SELECT doc_id, chunk_idx, tok_start, tok_end,
                 tok_end - tok_start AS n_chunk_tokens,
                 CAST(CASE WHEN tok_start = 0 THEN 0
                      ELSE list_reduce(list_transform(ts[1:tok_start],
                             t -> length(t)), (a, b) -> a + b)
                           + tok_start END AS INT) AS char_start,
                 CAST(length(array_to_string(ts[tok_start+1:tok_end],
                   ' ')) AS INT) AS char_len,
                 array_to_string(ts[tok_start+1:tok_end], ' ')
                   AS chunk_text
          FROM c2 ORDER BY doc_id, chunk_idx"""),
  )
}

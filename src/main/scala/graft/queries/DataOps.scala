package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.sim.{Pq, SemDedup, Similarity}
import graft.text.TextAnalysis

/** Conformance queries for the training-data-pipeline operators
  * (dedup / similarity / text analysis / multimodal) over the
  * `documents` and `embeddings` tables, each calling the REAL module
  * code with a DuckDB oracle mirroring the arithmetic exactly
  * (rank-encoded dictionaries + sequential folds → bit-identical
  * results; see module Scaladoc for the production-path variants).
  */
object DataOps extends QueryModule {

  // Exact dedup needs actual duplicates: plant copies (doc_id+100000)
  // of every 10th document, then find groups by full-text identity.
  private def dedupExact(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val planted = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    Dedup.exactGroups(docs.unionByName(planted), "doc_id", "text")
      // member_ids serialized to a CSV string: the driver's pandas compare
      // cannot hash array cells; semantics unchanged.
      .select(col("canonical_id"), col("n_copies"),
        array_join(col("member_ids").cast("array<string>"), ",").as("member_ids"))
      .orderBy("canonical_id")
  }

  // The shingle index and its rank dictionary feed three registry
  // entries (jaccard, minhash, simhash) that a Verify/Bench run calls
  // back-to-back — memoize and persist them per (session, dir) so the
  // explode+distinct and the dictionary's global sort run once.
  // (SessionMemo is weak on the session: stopped sessions GC.)
  /** (id, shingle), persisted. */
  private def sharedShingles(s: SparkSession, d: String): DataFrame =
    SessionMemo(s, d, "dedup_shingles") {
      Dedup.shingles(Tables.documents(s, d), "doc_id", "text").persist()
    }

  /** (id, sid) — dictionary-encoded, persisted. Separate memo entry:
    * the rank dictionary does driver-side bucket-offset work eagerly,
    * and only the minhash/simhash oracle paths need it — jaccard and
    * clustering must not pay for it. The shingle memo is resolved
    * BEFORE this entry's thunk: a nested computeIfAbsent on the same
    * map violates the ConcurrentHashMap contract (recursive update). */
  private def sharedEncoded(s: SparkSession, d: String): DataFrame = {
    val sh = sharedShingles(s, d)
    SessionMemo(s, d, "dedup_encoded") {
      sh.join(Dedup.shingleDictionary(sh), Seq("shingle"))
        .select("id", "sid").persist()
    }
  }

  /** Jaccard>0.3 pairs feed three registry entries (the pair list, the
    * clusters built on it, and the incremental-admission near check) —
    * one posting-list self-join, memoized. */
  private def sharedJaccardPairs(s: SparkSession, d: String): DataFrame = {
    val sh = sharedShingles(s, d)   // resolved before the thunk (no nesting)
    SessionMemo(s, d, "jaccard_pairs") {
      Dedup.jaccardPairsFromShingles(sh, 0.3).persist()
    }
  }

  private def dedupJaccard(s: SparkSession, d: String): DataFrame =
    sharedJaccardPairs(s, d).orderBy("id1", "id2")

  /** The cluster labeling feeds two registry entries (the cluster list
    * and the keep-list decision built on it) — one CC pass, memoized. */
  private def sharedClusters(s: SparkSession, d: String): DataFrame = {
    val pairs = sharedJaccardPairs(s, d)   // resolved before the thunk
    SessionMemo(s, d, "dedup_clusters") {
      Dedup.connectedComponents(pairs.select("id1", "id2")).persist()
    }
  }

  private def dedupMinhashLsh(s: SparkSession, d: String): DataFrame = {
    val encoded = sharedEncoded(s, d)
    val sigs = Dedup.minhashSignaturesAgg(encoded, numHashes = 16)
    Dedup.lshCandidatesFromSigs(sigs, rowsPerBand = 2, numHashes = 16)
      .select(col("id1"), col("id2"))
      .orderBy("id1", "id2")
  }

  // SimHash features = 3-gram shingles (distinct per doc): token-level
  // features cannot discriminate on a corpus that shares one small
  // vocabulary; shingles separate near-dups from the background.
  private def dedupSimhash(s: SparkSession, d: String): DataFrame = {
    val encoded = sharedEncoded(s, d)
    Dedup.simhashPairs(Dedup.simhash(encoded, bits = 32), maxDist = 6)
      .orderBy("id1", "id2")
  }

  // Near-dup clusters: connected components over the Jaccard pair list
  // — the step a dedup pipeline actually keys its "keep one canonical
  // doc per group" decision on. Oracle = DuckDB recursive reachability
  // (components are tiny, so path enumeration is bounded).
  private def dedupClusters(s: SparkSession, d: String): DataFrame =
    sharedClusters(s, d).orderBy("id")

  // Keep-BEST canonical selection: real pipelines keep the highest-
  // quality member of each near-dup cluster, not the lowest id. One
  // window per cluster (argmax by text length, id tiebreak) over the
  // metadata-scale cluster membership — the corpus is only touched to
  // look up member quality.
  private def dedupKeepBest(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"),
      length(col("text")).as("quality"))
    val members = broadcast(sharedClusters(s, d))
      .join(docs, col("id") === col("doc_id"))
    val w = Window.partitionBy("cluster_id")
      .orderBy(desc("quality"), asc("id"))
    members
      .withColumn("__rn", row_number().over(w))
      .groupBy("cluster_id")
      .agg(max(when(col("__rn") === 1, col("id"))).as("best_id"),
        max(when(col("__rn") === 1, col("quality"))).as("best_quality"),
        count(lit(1)).as("n_members"))
      .orderBy("cluster_id")
  }

  // Incremental dedup — the daily-ingest shape: a NEW batch (doc_id %
  // 4 == 0 plays the increment) is admitted against the EXISTING corpus
  // without re-clustering anything. A new doc is rejected if its text
  // exact-matches an existing doc (semi-join on text; at scale, on
  // xxhash64(text) buckets) or if it near-matches one (the shared pair
  // list filtered to cross (new, old) pairs — candidate generation
  // already touches only shingle-colliding docs, so the increment
  // never pays a corpus-wide scan beyond its own shingles).
  private def dedupIncremental(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // the synthetic corpus has no cross-slice exact copies, so plant
    // some: re-ingested existing docs under fresh increment ids (both
    // engines mirror the planting). Planted docs are not in the shared
    // shingle index, so they exercise the exact branch specifically —
    // the near branch is exercised by the organic doc_id%4 slice.
    Planting.requireHeadroom(docs, "doc_id", "dedup_incremental")
    val planted = docs.filter(col("doc_id") % 40 === 1)
      .select((lit(100000L) + col("doc_id") * 4).as("doc_id"), col("text"))
    val incoming = docs.filter(col("doc_id") % 4 === 0)
      .select("doc_id", "text").unionByName(planted)
    val existing = docs.filter(col("doc_id") % 4 =!= 0)
    val exactIds = incoming.join(existing.select("text"), Seq("text"),
        "left_semi")
      .select(col("doc_id")).withColumn("exact_dup", lit(true))
    val pairs = sharedJaccardPairs(s, d)
    val nearIds = pairs
      .filter((col("id1") % 4 === 0) =!= (col("id2") % 4 === 0))
      .select(when(col("id1") % 4 === 0, col("id1")).otherwise(col("id2"))
        .as("doc_id"))
      .distinct().withColumn("near_dup", lit(true))
    incoming.select("doc_id")
      .join(exactIds, Seq("doc_id"), "left")
      .join(nearIds, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("exact_dup"), lit(false)).as("exact_dup"),
        coalesce(col("near_dup"), lit(false)).as("near_dup"),
        (coalesce(col("exact_dup"), lit(false)) ||
          coalesce(col("near_dup"), lit(false))).unary_!.as("admitted"))
      .orderBy("doc_id")
  }

  /** Run the STREAMING admission end-to-end once per (session, dir):
    * seed state with the "existing" corpus (doc_id % 4 ≠ 0), then
    * deliver three checkpointed increments through
    * [[graft.streaming.StreamAdmission]]: (1) the organic increment
    * (doc_id % 4 == 0 — exercises the near-dup check against seeded
    * shingle state), (2) planted exact copies of existing docs (all
    * rejected) plus fresh unique one-token docs (all admitted), (3) a
    * RE-DELIVERY of increment 1 — the id skip must make it a no-op.
    * Returns the state path; the registry entry reads docs/. */
  private def streamAdmittedState(s: SparkSession, d: String): String =
    SessionMemo(s, d, "stream_admit") {
      val base = s"${sys.props("java.io.tmpdir")}/graft_admit_" +
        java.lang.Integer.toHexString(d.hashCode)
      val (src, cp, state) = (s"$base/src", s"$base/cp", s"$base/state")
      graft.sources.TableSwap.deleteRecursively(java.nio.file.Paths.get(base))
      val docs = Tables.documents(s, d)
      Planting.requireHeadroom(docs, "doc_id", "dedup_stream_admit")
      val existing = docs.filter(col("doc_id") % 4 =!= 0)
        .select("doc_id", "text")
      graft.streaming.StreamAdmission.seed(s, existing, state,
        "doc_id", "text")
      val incA = docs.filter(col("doc_id") % 4 === 0)
        .select("doc_id", "text")
      val incB = docs.filter(col("doc_id") % 40 === 1)
        .select((lit(Planting.Offset) + col("doc_id") * 4).as("doc_id"),
          col("text"))
        .unionByName(docs.filter(col("doc_id") % 40 === 3)
          .select((col("doc_id") + 2 * Planting.Offset).as("doc_id"),
            concat(lit("zqx"), col("doc_id").cast("string")).as("text")))
      def deliver(inc: DataFrame): Unit = {
        inc.coalesce(1).write.mode("append").parquet(src)
        val stream = s.readStream.schema(incA.schema).parquet(src)
        val done = graft.streaming.StreamAdmission.start(stream, state,
            cp, "doc_id", "text", tau = 0.3, maxShingleDf = 1000L)
          .awaitTermination(300000)
        require(done, "dedup_stream_admit: admission stream did not " +
          "finish within 5 minutes — refusing to read partial state")
      }
      deliver(incA)
      deliver(incB)
      deliver(incA)   // re-delivery: must converge with zero changes
      state
    }

  /** T2-composed-with-dedup in the registry denominator: the admitted
    * corpus after the full streaming run, hash-checked against a
    * DuckDB oracle that recomputes the sequential admission truth
    * (exact text vs existing; raw-size Jaccard > 0.3 over df≤1000
    * shingles for the organic increment; fresh docs admitted). */
  private def dedupStreamAdmit(s: SparkSession, d: String): DataFrame =
    s.read.parquet(streamAdmittedState(s, d) + "/docs")
      .select(col("id").as("doc_id"), length(col("text")).as("n_chars"),
        col("n_sh").cast("long").as("n_sh"))
      .orderBy("doc_id")

  // Benchmark decontamination (the GPT-3-style n-gram overlap check):
  // flag every training doc sharing ANY word 3-gram with the held-out
  // benchmark slice (doc_id % 97 == 0 plays the benchmark here;
  // production uses 13-grams — same operator, different n). The check
  // is an inverted-index LEFT SEMI join on the shingle — work scales
  // with postings of benchmark shingles, never doc × doc; at 100 TB
  // the benchmark shingle set is a broadcast.
  private def textDecontaminate(s: SparkSession, d: String): DataFrame = {
    val sh = sharedShingles(s, d)
    val benchShingles = sh.filter(col("id") % 97 === 0)
      .select("shingle").distinct()
    val flagged = sh.filter(col("id") % 97 =!= 0)
      .join(broadcast(benchShingles), Seq("shingle"), "left_semi")
      .select(col("id").as("doc_id")).distinct()
      .withColumn("contaminated", lit(true))
    // flagged grows with the corpus (worst case: everything) — equi
    // join on doc_id, never a broadcast
    Tables.documents(s, d).filter(col("doc_id") % 97 =!= 0)
      .select("doc_id")
      .join(flagged, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("contaminated"), lit(false)).as("contaminated"))
      .orderBy("doc_id")
  }

  // The composed OUTPUT of the dedup stage: one keep/drop decision per
  // document — near-dup cluster members defer to the cluster minimum
  // (canonical), everything else keeps itself. The cluster table is
  // metadata-scale (members of near-dup pairs only), so the decision
  // join broadcasts against the full corpus — the shape that holds at
  // 100 TB.
  private def dedupKeepList(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id")
    val clusters = sharedClusters(s, d)
    docs.join(broadcast(clusters), docs("doc_id") === clusters("id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("canonical_id"),
        (coalesce(col("cluster_id"), col("doc_id")) === col("doc_id"))
          .as("keep"))
      .orderBy("doc_id")
  }

  /** The whole curation pipeline composed end-to-end over a planted
    * corpus (originals ∪ copies of every 10th doc): Gopher quality
    * gate → exact dedup (keep-first-by-id) → near-dup keep decision
    * (Jaccard clusters, canonical = min member) → train/test split.
    * One row per document with every stage's verdict — the "switch
    * your pipeline to this library" query. All four stages are
    * individually hash-proven; this entry proves their COMPOSITION
    * against one SQL transcript of the same rules.
    *
    * Scale notes: the exact stage's text-keyed arg-min/join would key
    * on xxhash64(text) in production (Dedup scaladoc); the cluster
    * table is metadata-scale and broadcasts; gate and split are pure
    * projections. Planted copies keep every branch live: a copy is
    * exact-dup AND near-loser; organic near-dups hit only the near
    * branch; short docs hit only the gate. */
  /** Near-dup cluster table of the PLANTED corpus, shared by both
    * curation pipelines. The planted shingle index is DERIVED from the
    * memoized organic one (a copy's shingles are the original's rows
    * under the shifted id — shingles() is per-doc deterministic, and
    * null text produces no shingle rows either way), so the corpus
    * explode is shared with the jaccard/minhash/simhash entries
    * instead of re-run; CC runs once per (session, dir). */
  private def curateClusters(s: SparkSession, d: String): DataFrame =
    SessionMemo(s, d, "curate_clusters") {
      val sh = sharedShingles(s, d)
      val plantedSh = sh.unionByName(sh.filter(col("id") % 10 === 0)
        .select((col("id") + Planting.Offset).as("id"), col("shingle")))
      Dedup.connectedComponents(
        Dedup.jaccardPairsFromShingles(plantedSh, 0.3)
          .select("id1", "id2")).persist()
    }

  /** The curation pipelines' planted corpus. text is coalesced to ''
    * at the corpus seam: a NULL text would otherwise vanish in the
    * text-keyed exact-dedup join (NULL never equi-joins) while the
    * oracle keeps the row — normalizing once makes every downstream
    * stage null-free and engine-identical. The planted union feeds two
    * full-corpus consumers per pipeline (gate, exact arg-min) —
    * memoized + persisted so they share one materialization; the
    * headroom guard runs once in the build. */
  private def curateU(s: SparkSession, d: String): DataFrame =
    SessionMemo(s, d, "curate_u") {
      val base = Tables.documents(s, d)
        .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      Planting.requireHeadroom(base, "doc_id", "pipeline_curate")
      base.unionByName(base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + Planting.Offset).as("doc_id"), col("text")))
        .persist()
    }

  private def pipelineCurate(s: SparkSession, d: String): DataFrame = {
    val u = curateU(s, d)
    val clusters = curateClusters(s, d)
    val gated = graft.text.TextAnalysis.qualityGate(u)
      .select(col("doc_id"), col("text"), col("keep").as("keep_quality"))
    // arg-min by aggregation (no text-partitioned window); renamed
    // columns — firstByText derives from u, same-name join columns
    // would hit ambiguous-self-join resolution
    val firstByText = u.groupBy("text").agg(min("doc_id").as("__first_id"))
      .withColumnRenamed("text", "__t")
    val labeled = gated.join(firstByText, col("text") === col("__t"))
      .withColumn("is_exact_dup", col("doc_id") =!= col("__first_id"))
      .join(broadcast(clusters), col("doc_id") === col("id"), "left")
      .withColumn("is_near_loser",
        coalesce(col("cluster_id") =!= col("doc_id"), lit(false)))
      .withColumn("admitted",
        col("keep_quality") && !col("is_exact_dup") && !col("is_near_loser"))
    graft.sampling.Sampling.hashSplit(labeled, "doc_id", 0.8)
      .select("doc_id", "keep_quality", "is_exact_dup", "is_near_loser",
        "admitted", "split")
      .orderBy("doc_id")
  }

  /** pipeline_curate with the SEMANTIC stage added (the full modern
    * curation recipe: rule gate → exact dedup → lexical near-dup →
    * embedding near-dup → split). The semantic verdict comes from the
    * hash-proven exhaustive SemDeDup labeling over `embeddings`
    * (vec_id ≡ doc_id in the synthesized corpus); planted copies have
    * no embedding row, so they pass the semantic stage untouched (left
    * join, null → keep) — exactly what the oracle's LEFT JOIN does.
    * Every stage's rule is copied verbatim from its per-operator
    * oracle, so the composition is hash-proven end-to-end like v1. */
  private def pipelineCurateV2(s: SparkSession, d: String): DataFrame = {
    val u = curateU(s, d)
    val clusters = curateClusters(s, d)
    val sem = graft.sim.SemDedup
      .semanticDedupExhaustive(Tables.embeddings(s, d), 0.35)
      .select(col("vec_id"), (!col("keep")).as("__sem_loser"))
    val gated = graft.text.TextAnalysis.qualityGate(u)
      .select(col("doc_id"), col("text"), col("keep").as("keep_quality"))
    val firstByText = u.groupBy("text").agg(min("doc_id").as("__first_id"))
      .withColumnRenamed("text", "__t")
    val labeled = gated.join(firstByText, col("text") === col("__t"))
      .withColumn("is_exact_dup", col("doc_id") =!= col("__first_id"))
      .join(broadcast(clusters), col("doc_id") === col("id"), "left")
      .withColumn("is_near_loser",
        coalesce(col("cluster_id") =!= col("doc_id"), lit(false)))
      // the semantic-loser table is corpus-bounded metadata (one bit
      // per embedded doc) — broadcast, the corpus side never shuffles
      .join(broadcast(sem), col("doc_id") === col("vec_id"), "left")
      .withColumn("is_sem_loser",
        coalesce(col("__sem_loser"), lit(false)))
      .withColumn("admitted",
        col("keep_quality") && !col("is_exact_dup") &&
          !col("is_near_loser") && !col("is_sem_loser"))
    graft.sampling.Sampling.hashSplit(labeled, "doc_id", 0.8)
      .select("doc_id", "keep_quality", "is_exact_dup", "is_near_loser",
        "is_sem_loser", "admitted", "split")
      .orderBy("doc_id")
  }

  // Containment coverage needs a contained doc: plant the 15-word
  // PREFIX of every 20th document — its 3-gram shingles are a strict
  // subset of the original's, so containment(prefix→orig) = 1.0 while
  // jaccard stays low (the signal Jaccard misses by construction).
  // The planted side's shingles are computed fresh; the organic side
  // rides the shared memoized index.
  private def dedupContainment(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    Planting.requireHeadroom(docs, "doc_id", "dedup_containment")
    val planted = docs.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + Planting.Offset).as("doc_id"),
        array_join(slice(split(lower(trim(col("text"))), " +"), 1, 15), " ")
          .as("text"))
    val sh = sharedShingles(s, d)
      .unionByName(Dedup.shingles(planted, "doc_id", "text"))
    Dedup.containmentPairsFromShingles(sh, 0.8)
      .orderBy("id_contained", "id_container")
  }

  // Decontamination with a Bloom prefilter on the corpus shingle
  // stream: at 100 TB the stream side dwarfs the bench set, and the
  // sketch (bits, not keys) drops ~every clean shingle BEFORE the
  // broadcast semi-join; the exact join then removes false positives,
  // so the result — and the oracle — are identical to
  // text_decontaminate. The composition is the point: the sketch
  // travels as bytes between pipeline stages.
  private def textDecontaminateBloom(s: SparkSession, d: String): DataFrame = {
    val sh = sharedShingles(s, d)
    val benchShingles = sh.filter(col("id") % 97 === 0)
      .select("shingle").distinct()
    val sketch = graft.ops.BloomPrune.buildKeySketch(
      benchShingles, "shingle", expectedItems = 100000)
    val flagged = sh.filter(col("id") % 97 =!= 0)
      .filter(graft.ops.BloomPrune.mightContain(sketch, col("shingle")))
      .join(broadcast(benchShingles), Seq("shingle"), "left_semi")
      .select(col("id").as("doc_id")).distinct()
      .withColumn("contaminated", lit(true))
    Tables.documents(s, d).filter(col("doc_id") % 97 =!= 0)
      .select("doc_id")
      .join(flagged, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("contaminated"), lit(false)).as("contaminated"))
      .orderBy("doc_id")
  }

  // Production-path conformance for the xxhash64 shingle-key dedup
  // (the no-global-sort path promised by Dedup.shingleHash): MinHash/LSH
  // and SimHash candidate sets, each measured as recall against the
  // EXACT Jaccard≥0.5 pairs over the same shared shingle index. The
  // hashing is engine-specific → rows-only driver check; the recall
  // floors are pinned in DedupSpec. Every stage here shuffles on a hash
  // key — zero global sorts, unlike the rank-dictionary oracle variants.
  private def dedupProdConformance(s: SparkSession, d: String): DataFrame = {
    // Deterministic BOUNDED sample: the exact-truth probe is quadratic in
    // sample size, so the sample must not grow with the corpus — every
    // other doc up to an absolute cap (at sf0.01 the cap is a no-op; at
    // 100 TB the probe still costs what it costs here). Truth is computed
    // on the SAME sample so recall stays well-defined.
    val docs = Tables.documents(s, d)
      .filter(col("doc_id") % 2 === 0 && col("doc_id") < 2000)
    val sh = Dedup.shingles(docs, "doc_id", "text").cache()
    // truth must be EXACT: disable the stop-shingle cap here — the
    // capped variant is itself an approximation and would make the
    // recall floor self-referential.
    val truth = Dedup.jaccardPairsFromShingles(sh, 0.5,
        maxShingleDf = Long.MaxValue)
      .select("id1", "id2").cache()
    // One-pass tally: full-outer join of candidates and truth, then a
    // single aggregate — each candidate set is evaluated exactly once.
    def stats(path: String, cand: DataFrame): DataFrame =
      cand.withColumn("is_cand", lit(1L))
        .join(truth.withColumn("is_true", lit(1L)),
          Seq("id1", "id2"), "full_outer")
        .agg(sum("is_cand").as("n_candidates"),
          sum("is_true").as("n_true"),
          sum(col("is_cand") * col("is_true")).as("n_hit"))
        .select(lit(path).as("path"), col("n_candidates"), col("n_true"),
          col("n_hit"),
          (col("n_hit").cast("double") / col("n_true")).as("recall"))
    val mh = stats("minhash_lsh", Dedup.minhashCandidatesProd(sh))
    val sim = stats("simhash",
      Dedup.simhashPairs(Dedup.simhashProd(sh), maxDist = 6)
        .select("id1", "id2"))
    mh.unionByName(sim).orderBy("path")
  }

  private def dedupEmbedCosine(s: SparkSession, d: String): DataFrame =
    Similarity.cosineNearDupPairs(Tables.embeddings(s, d), 0.35)
      .orderBy("id1", "id2")

  // SemDeDup scale path: 8 k-means cells bound the pair work. Rows-only
  // by design (Lloyd isn't DuckDB-expressible); SemDedupSpec pins it to
  // the exhaustive twin (numCells=1 parity + keeper-superset), which IS
  // hash-proven below.
  private def dedupSemantic(s: SparkSession, d: String): DataFrame =
    SemDedup.semanticDedup(Tables.embeddings(s, d), 0.35, numCells = 8)
      .orderBy("vec_id")

  // Exact twin: full near-dup graph + CC keeper labels, hash-proven
  // against the recursive-CC DuckDB oracle (same 0.35 threshold as
  // dedup_embed_cosine so the pair set is the proven one).
  private def dedupSemanticExhaustive(s: SparkSession, d: String): DataFrame =
    SemDedup.semanticDedupExhaustive(Tables.embeddings(s, d), 0.35)
      .orderBy("vec_id")

  private def textLangid(s: SparkSession, d: String): DataFrame =
    TextAnalysis.langScores(Tables.documents(s, d))
      .select("doc_id", "score_en", "score_es", "score_de", "lang_pred")
      .orderBy("doc_id")

  private def textQuality(s: SparkSession, d: String): DataFrame =
    TextAnalysis.qualityScores(Tables.documents(s, d))
      .select("doc_id", "n_tokens", "n_chars", "n_punct", "n_stopwords",
        "avg_token_len", "punct_ratio", "stopword_ratio")
      .orderBy("doc_id")

  private def textTokens(s: SparkSession, d: String): DataFrame =
    TextAnalysis.tokenCounts(Tables.documents(s, d))
      .select("doc_id", "n_ws_tokens", "n_bpe_tokens", "n_subwords")
      .orderBy("doc_id")

  private def textFingerprint(s: SparkSession, d: String): DataFrame =
    TextAnalysis.fingerprint(Tables.documents(s, d))
      .select("doc_id", "fingerprint")
      .orderBy("doc_id")

  // Per-language token-length distribution — the "is this corpus slice
  // the right shape" check before mixing. Exact interpolated quantiles
  // at DYADIC fractions (.25/.5/.75): on integer token counts every
  // intermediate (h = p·(n−1), the fraction, the lerp) is exact in
  // a double, so Spark's percentile and DuckDB's quantile_cont agree
  // bit-for-bit regardless of their lerp formulation. Non-dyadic
  // fractions (0.1) would NOT be cross-engine hash-stable.
  private def textQuantiles(s: SparkSession, d: String): DataFrame =
    TextAnalysis.tokenCounts(Tables.documents(s, d))
      .groupBy("lang")
      .agg(
        expr("percentile(n_bpe_tokens, 0.25)").as("p25"),
        expr("percentile(n_bpe_tokens, 0.5)").as("p50"),
        expr("percentile(n_bpe_tokens, 0.75)").as("p75"),
        count(lit(1)).as("n"))
      .orderBy("lang")

  // PII scrubbing over a corpus with planted contacts: every 5th doc
  // gains an email, every 7th a URL, every 3rd a phone, every 11th an
  // IPv4 literal (the synthetic corpus has none, so the redaction is
  // exercised against known ground truth).
  private def textRedact(s: SparkSession, d: String): DataFrame = {
    val dirty = Tables.documents(s, d)
      .orderBy("doc_id")
      .withColumn("dirty", concat(col("text"),
        when(col("doc_id") % 5 === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit(" see https://example.org/d"), col("doc_id")))
          .otherwise(lit("")),
        when(col("doc_id") % 3 === 0,
          concat(lit(" call +1-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" host 192.168."), (col("doc_id") % 256).cast("string"),
            lit("."), (col("doc_id") % 250).cast("string")))
          .otherwise(lit(""))))
    TextAnalysis.redact(dirty, "dirty")
      .select("doc_id", "n_emails", "n_urls", "n_phones", "n_ips", "redacted")
  }

  private def simCosineTopk(s: SparkSession, d: String): DataFrame =
    Similarity.bruteForceTopK(Tables.embeddings(s, d),
      col("vec_id") % 50 === 0, k = 10)
      .orderBy("query_id", "rank")

  // Approximate ANN — engine-specific bucketing; rows-only check here,
  // recall-vs-exact asserted in ScalaTest.
  private def simAnnLsh(s: SparkSession, d: String): DataFrame =
    Similarity.lshTopK(Tables.embeddings(s, d),
      col("vec_id") % 50 === 0, k = 10, numPlanes = 4)
      .orderBy("query_id", "rank")

  // Multi-probe variant: Hamming-ball probes recover recall lost to
  // single-bucket LSH (monotone-recall spec in DataOpsSpec); rows-only
  // like sim_ann_lsh (engine-specific bucketing).
  private def simAnnLshMultiProbe(s: SparkSession, d: String): DataFrame =
    Similarity.lshTopKMultiProbe(Tables.embeddings(s, d),
      col("vec_id") % 50 === 0, k = 10, numPlanes = 4, flips = 1)
      .orderBy("query_id", "rank")

  // IVF ANN — centroid index, nprobe cells per query; engine-specific
  // (Lloyd centroids), so rows-only here; nprobe=all ≡ brute-force
  // equality and recall floors asserted in ScalaTest.
  private def simIvfTopk(s: SparkSession, d: String): DataFrame =
    Similarity.ivfTopK(Tables.embeddings(s, d),
      col("vec_id") % 50 === 0, k = 10, numCells = 8, nprobe = 3)
      .orderBy("query_id", "rank")

  // PQ codebooks feed three registry entries (ADC top-k, two-stage
  // rerank, exhaustive proof) — train once per (session, dir). d=64 →
  // m=8 subspaces of 8 dims, 64 codes each: 8 bytes/vector, the 64×
  // memory lever (vs int8's 4×). ksub=64 is the recall sweet spot on
  // the synthetic (near-random — PQ's worst case) embeddings:
  // 0.95 recall@10 from a 100-candidate pool (DataOpsSpec floor 0.9).
  private def pqModel(s: SparkSession, d: String): Pq.PqModel =
    SessionMemo(s, d, "pq_model") {
      Pq.trainPq(Tables.embeddings(s, d), m = 8, ksub = 64, iters = 2)
    }

  // ADC ranking is trained-codebook-specific (float k-means) like IVF —
  // rows-only here; exhaustive equality and recall floors in ScalaTest.
  private def simPqTopk(s: SparkSession, d: String): DataFrame =
    Pq.pqTopK(Tables.embeddings(s, d), col("vec_id") % 50 === 0,
        k = 10, pqModel(s, d))
      .orderBy("query_id", "rank")

  // Two-stage: 100 ADC candidates re-ranked by exact cosine to 10.
  private def simPqRerank(s: SparkSession, d: String): DataFrame =
    Pq.pqRerank(Tables.embeddings(s, d), col("vec_id") % 50 === 0,
        k = 10, mPool = 100, pqModel(s, d))
      .orderBy("query_id", "rank")

  // Exhaustive-mode conformance (the IVF/LSH trick): with the pool ≥
  // corpus size stage 1 keeps every candidate, so the PQ encode → ADC
  // → rerank machinery must reproduce brute force bit-for-bit against
  // the same oracle as sim_cosine_topk.
  private def simPqExhaustive(s: SparkSession, d: String): DataFrame =
    Pq.pqRerank(Tables.embeddings(s, d), col("vec_id") % 50 === 0,
        k = 10, mPool = Int.MaxValue, pqModel(s, d))
      .orderBy("query_id", "rank")

  // Hash anchor for the ADC table-lookup ranking itself (which the
  // exhaustive twin above bypasses — its rerank degenerates to brute
  // force): int8-quantized vectors against the pinned integer
  // codebook, every score BIGINT-exact. Same adcSumExpr, same nearest
  // kernel, same broadcast-LUT plan as the trained path.
  private def simPqPinned(s: SparkSession, d: String): DataFrame =
    Pq.pqTopKPinned(Tables.embeddings(s, d), col("vec_id") % 50 === 0,
        k = 10)
      .orderBy("query_id", "rank")

  // Within-doc duplicate 3-gram fraction — the "repetitive document"
  // filter signal (drives the codegen word_ngrams kernel through an
  // oracle-checked aggregate, not just the dedup pipelines).
  private def textRepetition(s: SparkSession, d: String): DataFrame =
    TextAnalysis.repetition(Tables.documents(s, d))
      .select("doc_id", "n_grams", "n_distinct_grams", "dup_gram_frac")
      .orderBy("doc_id")

  // Gopher-style rule gate: word-count bounds, mean word length,
  // symbol ratio — the pre-model quality filter of an LLM pipeline.
  private def textQualityGate(s: SparkSession, d: String): DataFrame =
    TextAnalysis.qualityGate(Tables.documents(s, d))
      .select("doc_id", "n_words", "mean_word_len", "symbol_ratio", "keep")
      .orderBy("doc_id")

  // Collocations: adjacent token pairs by lift (the PMI order without
  // the non-portable log) — phrase mining over the corpus.
  private def textCollocations(s: SparkSession, d: String): DataFrame =
    TextAnalysis.collocations(Tables.documents(s, d), "text",
      minCount = 5, k = 100)

  // Corpus vocabulary: token → frequency, top 500 by (count desc,
  // token) — tokenizer/vocab-building step; one shuffle + TakeOrdered.
  private def vocabTopk(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("token")).limit(500)

  // Per-label embedding centroids (decimal-exact means — the building
  // block behind IVF recentering and class prototypes).
  private def embCentroids(s: SparkSession, d: String): DataFrame =
    Similarity.labelCentroids(Tables.embeddings(s, d))
      .orderBy("label", "pos")

  // Nearest-centroid classification: every vector labeled by its
  // closest class prototype, BIGINT-exact end to end (taxonomy
  // tagging / cluster audit — the assignment step of k-means exposed
  // as an operator).
  private def embNnClassify(s: SparkSession, d: String): DataFrame =
    Similarity.nearestCentroidClassify(Tables.embeddings(s, d))
      .orderBy("vec_id")

  // Exhaustive-mode ANN conformance: with nprobe = numCells every cell
  // is probed, so the candidate set is the whole corpus and the IVF
  // join machinery (Lloyd index, cell-keyed probe join, per-query
  // window) must reproduce brute force bit-for-bit — pinned here
  // against the same DuckDB oracle as sim_cosine_topk.
  private def simIvfExhaustive(s: SparkSession, d: String): DataFrame =
    Similarity.ivfTopK(Tables.embeddings(s, d),
      col("vec_id") % 50 === 0, k = 10, numCells = 8, nprobe = 8)
      .orderBy("query_id", "rank")

  /** Index built on 6/7 of the corpus, the remaining 1/7 APPENDED
    * without retrain — built once per (session, dir). */
  private def ivfAppendedIndex(s: SparkSession, d: String)
      : Similarity.IvfIndex =
    SessionMemo(s, d, "ivf_appended") {
      val emb = Tables.embeddings(s, d)
      val base = Similarity.buildIvfIndex(
        emb.filter(col("vec_id") % 7 =!= 3), numCells = 8, iters = 2)
      Similarity.appendToIvfIndex(base, emb.filter(col("vec_id") % 7 === 3))
    }

  // Realistic probe over the appended index — trained-centroid-specific
  // like sim_ivf_topk, so rows-only; append ≡ frozen-centroid rebuild
  // is pinned exactly in IvfAppendSpec.
  private def simIvfAppend(s: SparkSession, d: String): DataFrame =
    Similarity.ivfQuery(ivfAppendedIndex(s, d),
        col("vec_id") % 50 === 0, k = 10, nprobe = 3)
      .orderBy("query_id", "rank")

  // nprobe = numCells → every posting list is scanned, so the probe is
  // exhaustive and the result must equal brute force over the FULL
  // corpus — hash-proving the appended index dropped and duplicated
  // nothing (same twin trick as sim_ivf_exhaustive).
  private def simIvfAppendExhaustive(s: SparkSession, d: String)
      : DataFrame =
    Similarity.ivfQuery(ivfAppendedIndex(s, d),
        col("vec_id") % 50 === 0, k = 10, nprobe = 8)
      .orderBy("query_id", "rank")

  // Same trick for LSH: numPlanes = 0 → one bucket ≡ exhaustive. The
  // single-bucket join is a degenerate plan (conformance-only, sf0.01);
  // production retrieval is sim_ann_lsh's real bucketing.
  private def simLshExhaustive(s: SparkSession, d: String): DataFrame =
    Similarity.lshTopK(Tables.embeddings(s, d),
      col("vec_id") % 50 === 0, k = 10, numPlanes = 0)
      .orderBy("query_id", "rank")

  // The codec-stub decode path (fake video/audio blobs): text bytes
  // carry no image header, so HeaderDecoder falls through to the
  // deterministic stub — the seam a real FFmpeg decoder would fill.
  private def mmDecodeMeta(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    Multimodal.decodeMeta(
        Multimodal.assetsFromText(Tables.documents(s, d), "doc_id", "text"))
      .toDF()
      .orderBy("asset_id")
  }

  /** Plant REAL image files once per (session, dir): every 25th doc
    * becomes `asset_<id>.png` (JPEG for every 50th) whose header
    * encodes width = id%640+1, height = id*7%480+1 via
    * [[Multimodal.MediaHeaders]] — valid PNG IHDR / JPEG SOF0 bytes,
    * dimensions derivable from doc_id in the DuckDB oracle. The text
    * bytes ride after the header so payload sizes vary organically. */
  private def imageFixtureDir(s: SparkSession, d: String): String =
    SessionMemo(s, d, "mm_image_fixtures") {
      val base = s"${sys.props("java.io.tmpdir")}/graft_img_" +
        java.lang.Integer.toHexString(d.hashCode)
      val bp = java.nio.file.Paths.get(base)
      graft.sources.TableSwap.deleteRecursively(bp)
      java.nio.file.Files.createDirectories(bp)
      val docs = Tables.documents(s, d)
      docs.filter(col("doc_id") % 25 === 0).select("doc_id", "text")
        .collect().foreach { r =>
          val id = r.getLong(0)
          val tail =
            (if (r.isNullAt(1)) "" else r.getString(1)).getBytes("UTF-8")
          val (w, h) = ((id % 640 + 1).toInt, (id * 7 % 480 + 1).toInt)
          val (name, header) =
            if (id % 50 == 0) (s"asset_$id.jpg", Multimodal.MediaHeaders.jpeg(w, h))
            else (s"asset_$id.png", Multimodal.MediaHeaders.png(w, h))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$base/$name"), header ++ tail)
        }
      base
    }

  // REAL image metadata decode end-to-end: binaryFile scan over planted
  // PNG/JPEG files → HeaderDecoder byte arithmetic → dimensions the
  // oracle re-derives from doc_id (the planting formula) — proving the
  // parser reads the actual header bytes, not a stub.
  private def mmDecodeImage(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    Multimodal.decodeMeta(
        Multimodal.ingestBinary(s, imageFixtureDir(s, d)))
      .toDF()
      .orderBy("asset_id")
  }

  /** Plant a binary fixture directory once per (session, dir): every
    * 25th document's UTF-8 bytes as `asset_<id>.<ext>` (ext from id%3,
    * matching [[Multimodal.assetsFromText]]'s type rule), plus a
    * byte-identical copy under id+Offset for every 50th — then the
    * ingest tier reads them back through the REAL `binaryFile` source.
    * The driver-side file writes here are fixture PLANTING only
    * (bounded at 4% of docs); the operators under test are fully
    * distributed. */
  private def binaryFixtureDir(s: SparkSession, d: String): String =
    SessionMemo(s, d, "mm_binary_fixtures") {
      val base = s"${sys.props("java.io.tmpdir")}/graft_mm_" +
        java.lang.Integer.toHexString(d.hashCode)
      val bp = java.nio.file.Paths.get(base)
      graft.sources.TableSwap.deleteRecursively(bp)
      java.nio.file.Files.createDirectories(bp)
      val docs = Tables.documents(s, d)
      Planting.requireHeadroom(docs, "doc_id", "mm_binary_ingest")
      val exts = Seq("mp4", "img", "wav")   // id%3 = video/image/audio
      docs.filter(col("doc_id") % 25 === 0).select("doc_id", "text")
        .collect().foreach { r =>
          val id = r.getLong(0)
          val bytes = r.getString(1).getBytes("UTF-8")
          val ext = exts((id % 3).toInt)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$base/asset_$id.$ext"), bytes)
          if (id % 50 == 0) java.nio.file.Files.write(
            java.nio.file.Paths.get(
              s"$base/asset_${id + Planting.Offset}.$ext"), bytes)
        }
      base
    }

  // The source side of the multimodal tier made real: opaque blobs in,
  // (id, type, payload) out, no decode at scan time.
  private def mmBinaryIngest(s: SparkSession, d: String): DataFrame =
    Multimodal.ingestBinary(s, binaryFixtureDir(s, d))
      .toDF()
      .select(col("asset_id"), col("media_type"),
        length(col("payload")).as("n_bytes"))
      .orderBy("asset_id")

  // Payload-identity media dedup over the ingested blobs: planted
  // copies (every 50th) collapse onto their originals; the oracle
  // groups by the SAME bytes via the text the fixtures were written
  // from, so the hash-and-verify grouping is proven collision-proof.
  private def mmDedupExact(s: SparkSession, d: String): DataFrame =
    Multimodal.dedupExactMedia(
        Multimodal.ingestBinary(s, binaryFixtureDir(s, d)))
      .orderBy("canonical_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact"          -> (dedupExact _),
    "dedup_ngram_jaccard"  -> (dedupJaccard _),
    "dedup_minhash_lsh"    -> (dedupMinhashLsh _),
    "dedup_simhash"        -> (dedupSimhash _),
    "dedup_clusters"       -> (dedupClusters _),
    "dedup_keep_list"      -> (dedupKeepList _),
    "dedup_keep_best"      -> (dedupKeepBest _),
    "text_decontaminate"   -> (textDecontaminate _),
    "dedup_incremental"    -> (dedupIncremental _),
    "dedup_stream_admit"   -> (dedupStreamAdmit _),
    "pipeline_curate"      -> (pipelineCurate _),
    "pipeline_curate_v2"   -> (pipelineCurateV2 _),
    "text_decontaminate_bloom" -> (textDecontaminateBloom _),
    "dedup_containment"    -> (dedupContainment _),
    "dedup_prod_paths"     -> (dedupProdConformance _),
    "dedup_embed_cosine"   -> (dedupEmbedCosine _),
    "dedup_semantic"       -> (dedupSemantic _),
    "dedup_semantic_exhaustive" -> (dedupSemanticExhaustive _),
    "text_langid"          -> (textLangid _),
    "text_quality"         -> (textQuality _),
    "text_tokens"          -> (textTokens _),
    "text_fingerprint"     -> (textFingerprint _),
    "text_quantiles"       -> (textQuantiles _),
    "text_redact"          -> (textRedact _),
    "text_repetition"      -> (textRepetition _),
    "text_quality_gate"    -> (textQualityGate _),
    "vocab_topk"           -> (vocabTopk _),
    "text_collocations"    -> (textCollocations _),
    "emb_centroids"        -> (embCentroids _),
    "emb_nn_classify"      -> (embNnClassify _),
    "sim_cosine_topk"      -> (simCosineTopk _),
    "sim_ann_lsh"          -> (simAnnLsh _),
    "sim_ann_lsh_mp"       -> (simAnnLshMultiProbe _),
    "sim_ivf_topk"         -> (simIvfTopk _),
    "sim_ivf_exhaustive"   -> (simIvfExhaustive _),
    "sim_ivf_append"       -> (simIvfAppend _),
    "sim_ivf_append_exhaustive" -> (simIvfAppendExhaustive _),
    "sim_lsh_exhaustive"   -> (simLshExhaustive _),
    "sim_pq_topk"          -> (simPqTopk _),
    "sim_pq_rerank"        -> (simPqRerank _),
    "sim_pq_exhaustive"    -> (simPqExhaustive _),
    "sim_pq_pinned"        -> (simPqPinned _),
    "mm_decode_meta"       -> (mmDecodeMeta _),
    "mm_decode_image"      -> (mmDecodeImage _),
    "mm_binary_ingest"     -> (mmBinaryIngest _),
    "mm_dedup_exact"       -> (mmDedupExact _)
  )

  private def force(df: DataFrame): Unit = {
    df.queryExecution.toRdd.count(); ()
  }

  /** The module's one-time shared builds, benched as explicit entries
    * (see [[QueryModule.benchBuilds]]): the seeded streaming-admission
    * state (3 checkpointed deliveries), the shingle-index family
    * (shingles → dictionary encoding → Jaccard pairs → CC clusters),
    * and the curation pipelines' planted corpus + cluster table. */
  override val benchBuilds: Map[String, (SparkSession, String) => Unit] =
    Map(
      "dedup_stream_admit_build" ->
        ((s, d) => { streamAdmittedState(s, d); () }),
      "dedup_index_build" -> ((s, d) => {
        force(sharedShingles(s, d)); force(sharedEncoded(s, d))
        force(sharedJaccardPairs(s, d)); force(sharedClusters(s, d))
      }),
      "pipeline_curate_build" -> ((s, d) => {
        force(curateU(s, d)); force(curateClusters(s, d))
      })
    )

  // Shared oracle CTEs -----------------------------------------------

  // ts mirrors TextAnalysis.tokens (split on ' +'): single-space split
  // with empty fragments removed ≡ regex runs-of-spaces split.
  // Parameterized on the source relation so the planted-corpus
  // composition (pipeline_curate) reuses the SAME definition — the
  // tokenization cannot drift between the per-operator oracles and the
  // composed one.
  private def tokCteFor(src: String) =
    s"""tok AS (
         SELECT doc_id,
                list_filter(string_split(lower(trim(text)), ' '),
                            t -> t <> '') AS ts,
                text
         FROM $src
       )"""

  private val tokCte = tokCteFor("documents")

  private val shCte =
    """sh AS (
         SELECT DISTINCT doc_id AS id, shingle
         FROM (SELECT doc_id,
                      unnest([array_to_string(ts[i:i+2], ' ')
                              for i in range(1, greatest(len(ts)-2, 1) + 1)]) AS shingle
               FROM tok)
         WHERE length(shingle) > 0
       )"""

  /** Jaccard>0.3 pair pipeline (df-capped), shared verbatim by the
    * dedup_ngram_jaccard and dedup_clusters oracles so the pair
    * definition cannot drift between them. */
  private val jpCte =
    """keep AS (SELECT shingle FROM sh GROUP BY shingle
                HAVING count(*) <= 1000),
       shc AS (SELECT sh.* FROM sh JOIN keep USING (shingle)),
       sizes AS (SELECT id, count(*) AS n_sh FROM shc GROUP BY id),
       common AS (
         SELECT a.id AS id1, b.id AS id2, count(*) AS n_common
         FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.id < b.id
         GROUP BY a.id, b.id),
       jp AS (
         SELECT id1, id2, n_common,
                CAST(n_common AS DOUBLE) / (s1.n_sh + s2.n_sh - n_common)
                  AS jaccard
         FROM common
         JOIN sizes s1 ON s1.id = id1
         JOIN sizes s2 ON s2.id = id2
         WHERE CAST(n_common AS DOUBLE) / (s1.n_sh + s2.n_sh - n_common) > 0.3)"""

  /** Connected-component labeling over the jp pair list (symmetrized
    * edges → recursive reachability → min-reachable label), shared by
    * the dedup_clusters / dedup_keep_list / dedup_keep_best oracles so
    * the label rule cannot drift between them. Requires WITH RECURSIVE. */
  private val ccCte =
    """edges AS (SELECT id1 AS a, id2 AS b FROM jp
                 UNION SELECT id2, id1 FROM jp),
       reach AS (
         SELECT a, b FROM edges
         UNION
         SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       lab AS (SELECT a AS id, least(a, min(b)) AS cluster_id
               FROM reach GROUP BY a)"""

  private val enList = "['the','a','of','and','to','in']"
  private val esList = "['el','la','de','y','que','los']"
  private val deList = "['der','die','das','und','ist']"

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """WITH u AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 100000 AS doc_id, text FROM documents
           WHERE doc_id % 10 = 0
         )
         SELECT min(doc_id) AS canonical_id,
                count(*) AS n_copies,
                array_to_string(list(doc_id ORDER BY doc_id), ',') AS member_ids
         FROM u GROUP BY text HAVING count(*) > 1
         ORDER BY canonical_id""",

    "dedup_ngram_jaccard" ->
      (s"""WITH $tokCte, $shCte, $jpCte
          SELECT id1, id2, n_common, jaccard FROM jp
          ORDER BY id1, id2"""),

    "dedup_clusters" ->
      (s"""WITH RECURSIVE $tokCte, $shCte, $jpCte, $ccCte
          SELECT id, cluster_id FROM lab ORDER BY id"""),

    "dedup_keep_best" ->
      (s"""WITH RECURSIVE $tokCte, $shCte, $jpCte, $ccCte,
          m AS (
            SELECT lab.cluster_id, lab.id,
                   CAST(length(d.text) AS INT) AS quality,
                   row_number() OVER (PARTITION BY lab.cluster_id
                                      ORDER BY length(d.text) DESC, lab.id)
                     AS rn
            FROM lab JOIN documents d ON d.doc_id = lab.id)
          SELECT cluster_id,
                 max(CASE WHEN rn = 1 THEN id END) AS best_id,
                 max(CASE WHEN rn = 1 THEN quality END) AS best_quality,
                 count(*) AS n_members
          FROM m GROUP BY cluster_id ORDER BY cluster_id"""),

    // Composition entry: every stage's rule is copied VERBATIM from its
    // per-operator oracle (gate = text_quality_gate, pairs/labels = the
    // shared jp/cc CTEs over the planted corpus, split = samp_train_test's
    // 0.8 'cccc' threshold) — the transcript proves the stages compose.
    "pipeline_curate" ->
      (s"""WITH RECURSIVE u AS (
             SELECT doc_id, coalesce(text, '') AS text FROM documents
             UNION ALL
             SELECT doc_id + 100000 AS doc_id, coalesce(text, '') AS text
             FROM documents
             WHERE doc_id % 10 = 0
           ),
           ${tokCteFor("u")}, $shCte, $jpCte, $ccCte,
           m AS (
             SELECT doc_id,
                    (CAST(len(ts) AS INT) BETWEEN 30 AND 10000)
                      AND ((CASE WHEN len(ts) > 0
                            THEN CAST(list_sum(list_transform(ts, w -> length(w))) AS DOUBLE) / len(ts)
                            ELSE 0.0 END) BETWEEN 3.0 AND 10.0)
                      AND ((CASE WHEN length(text) > 0
                            THEN CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE) / length(text)
                            ELSE 0.0 END) <= 0.1) AS keep_quality
             FROM tok),
           ex AS (
             SELECT doc_id,
                    doc_id <> min(doc_id) OVER (PARTITION BY text)
                      AS is_exact_dup
             FROM u)
           SELECT d.doc_id, m.keep_quality, ex.is_exact_dup,
                  coalesce(lab.id <> lab.cluster_id, FALSE) AS is_near_loser,
                  m.keep_quality AND NOT ex.is_exact_dup
                    AND NOT coalesce(lab.id <> lab.cluster_id, FALSE)
                    AS admitted,
                  CASE WHEN substr(md5('split' || CAST(d.doc_id AS VARCHAR)), 1, 4) < 'cccc'
                       THEN 'train' ELSE 'test' END AS split
           FROM u d
           JOIN m ON m.doc_id = d.doc_id
           JOIN ex ON ex.doc_id = d.doc_id
           LEFT JOIN lab ON lab.id = d.doc_id
           ORDER BY d.doc_id"""),

    // v1's transcript + the semantic stage: the dedup_semantic_exhaustive
    // labeling (pairwise cosine > 0.35 → recursive CC → min-id keeper)
    // joined on doc_id = vec_id; planted copies have no embedding row,
    // so the LEFT JOIN leaves them un-demoted
    "pipeline_curate_v2" ->
      (s"""WITH RECURSIVE u AS (
             SELECT doc_id, coalesce(text, '') AS text FROM documents
             UNION ALL
             SELECT doc_id + 100000 AS doc_id, coalesce(text, '') AS text
             FROM documents
             WHERE doc_id % 10 = 0
           ),
           ${tokCteFor("u")}, $shCte, $jpCte, $ccCte,
           semv AS (
             SELECT vec_id, embedding::DOUBLE[] AS vd FROM embeddings
           ),
           semn AS (
             SELECT vec_id, vd,
                    sqrt(list_reduce(list_transform(vd, (x,i) -> x * vd[i]),
                                     (a,b) -> a + b)) AS nrm
             FROM semv
           ),
           semp AS (
             SELECT a.vec_id AS id1, b.vec_id AS id2
             FROM semn a JOIN semn b ON a.vec_id < b.vec_id
             WHERE list_reduce(list_transform(a.vd, (x,i) -> x * b.vd[i]),
                               (p,q) -> p + q) / (a.nrm * b.nrm) > 0.35
           ),
           semedges AS (SELECT id1 AS a, id2 AS b FROM semp
                        UNION SELECT id2, id1 FROM semp),
           semreach AS (
             SELECT a, b FROM semedges
             UNION
             SELECT r.a, e.b FROM semreach r
             JOIN semedges e ON r.b = e.a),
           semlab AS (SELECT a AS id, least(a, min(b)) AS cluster_id
                      FROM semreach GROUP BY a),
           m AS (
             SELECT doc_id,
                    (CAST(len(ts) AS INT) BETWEEN 30 AND 10000)
                      AND ((CASE WHEN len(ts) > 0
                            THEN CAST(list_sum(list_transform(ts, w -> length(w))) AS DOUBLE) / len(ts)
                            ELSE 0.0 END) BETWEEN 3.0 AND 10.0)
                      AND ((CASE WHEN length(text) > 0
                            THEN CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE) / length(text)
                            ELSE 0.0 END) <= 0.1) AS keep_quality
             FROM tok),
           ex AS (
             SELECT doc_id,
                    doc_id <> min(doc_id) OVER (PARTITION BY text)
                      AS is_exact_dup
             FROM u)
           SELECT d.doc_id, m.keep_quality, ex.is_exact_dup,
                  coalesce(lab.id <> lab.cluster_id, FALSE) AS is_near_loser,
                  coalesce(semlab.id <> semlab.cluster_id, FALSE)
                    AS is_sem_loser,
                  m.keep_quality AND NOT ex.is_exact_dup
                    AND NOT coalesce(lab.id <> lab.cluster_id, FALSE)
                    AND NOT coalesce(semlab.id <> semlab.cluster_id, FALSE)
                    AS admitted,
                  CASE WHEN substr(md5('split' || CAST(d.doc_id AS VARCHAR)), 1, 4) < 'cccc'
                       THEN 'train' ELSE 'test' END AS split
           FROM u d
           JOIN m ON m.doc_id = d.doc_id
           JOIN ex ON ex.doc_id = d.doc_id
           LEFT JOIN lab ON lab.id = d.doc_id
           LEFT JOIN semlab ON semlab.id = d.doc_id
           ORDER BY d.doc_id"""),

    "dedup_incremental" ->
      (s"""WITH $tokCte, $shCte, $jpCte,
          inc AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0
            UNION ALL
            SELECT 100000 + doc_id * 4 AS doc_id, text FROM documents
            WHERE doc_id % 40 = 1),
          flags AS (
            SELECT d.doc_id,
                   EXISTS(SELECT 1 FROM documents o
                          WHERE o.doc_id % 4 <> 0 AND o.text = d.text)
                     AS exact_dup,
                   EXISTS(SELECT 1 FROM jp
                          WHERE (jp.id1 = d.doc_id AND jp.id2 % 4 <> 0)
                             OR (jp.id2 = d.doc_id AND jp.id1 % 4 <> 0))
                     AS near_dup
            FROM inc d)
          SELECT doc_id, exact_dup, near_dup,
                 NOT (exact_dup OR near_dup) AS admitted
          FROM flags ORDER BY doc_id"""),

    // sequential admission truth: seed = %4≠0; organic increment
    // checked exact-vs-seed and raw-size-Jaccard-vs-seed over df≤1000
    // shingles (state df + batch df ≡ whole-corpus df, since
    // seed ∪ increment = documents); planted copies all rejected by
    // the exact check; fresh one-token docs all admitted (their single
    // shingle has no seeded posting). Re-delivery adds nothing.
    "dedup_stream_admit" ->
      (s"""WITH $tokCte, $shCte,
          sizesr AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
          keepc AS (SELECT shingle FROM sh GROUP BY shingle
                    HAVING count(*) <= 1000),
          shc AS (SELECT sh.* FROM sh JOIN keepc USING (shingle)),
          cmn AS (SELECT a.id AS ida, b.id AS idb, count(*) AS n_common
                  FROM shc a JOIN shc b ON a.shingle = b.shingle
                  WHERE a.id % 4 = 0 AND b.id % 4 <> 0
                  GROUP BY a.id, b.id),
          nearA AS (SELECT DISTINCT cmn.ida AS doc_id
                    FROM cmn
                    JOIN sizesr sa ON sa.id = cmn.ida
                    JOIN sizesr sb ON sb.id = cmn.idb
                    WHERE CAST(cmn.n_common AS DOUBLE)
                            / (sa.n + sb.n - cmn.n_common) > 0.3),
          admA AS (SELECT d.doc_id, d.text FROM documents d
                   WHERE d.doc_id % 4 = 0
                     AND NOT EXISTS(SELECT 1 FROM documents o
                                    WHERE o.doc_id % 4 <> 0
                                      AND o.text = d.text)
                     -- within-batch exact copies: min id wins (mirrors
                     -- flagBatch's row_number-over-text rule)
                     AND NOT EXISTS(SELECT 1 FROM documents o2
                                    WHERE o2.doc_id % 4 = 0
                                      AND o2.text = d.text
                                      AND o2.doc_id < d.doc_id)
                     AND NOT EXISTS(SELECT 1 FROM nearA n
                                    WHERE n.doc_id = d.doc_id)),
          fin AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 4 <> 0
            UNION ALL SELECT doc_id, text FROM admA
            UNION ALL SELECT doc_id + 200000 AS doc_id,
                             'zqx' || CAST(doc_id AS VARCHAR) AS text
                      FROM documents WHERE doc_id % 40 = 3)
          SELECT f.doc_id, CAST(length(f.text) AS INT) AS n_chars,
                 CAST(coalesce(sz.n,
                   CASE WHEN f.doc_id >= 200000 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_sh
          FROM fin f LEFT JOIN sizesr sz ON sz.id = f.doc_id
          ORDER BY f.doc_id"""),

    "text_decontaminate" -> decontaminateOracle,
    // the Bloom prefilter is removed by the exact join — same truth
    "text_decontaminate_bloom" -> decontaminateOracle,

    // same df-capped inverted index as the jaccard entries; only the
    // denominator changes (each direction's own size)
    "dedup_containment" ->
      (s"""WITH u AS (
             SELECT doc_id, text FROM documents
             UNION ALL
             SELECT doc_id + 100000 AS doc_id,
                    array_to_string(list_filter(
                      string_split(lower(trim(text)), ' '),
                      t -> t <> '')[1:15], ' ') AS text
             FROM documents WHERE doc_id % 20 = 0
           ),
           ${tokCteFor("u")}, $shCte,
           keep AS (SELECT shingle FROM sh GROUP BY shingle
                    HAVING count(*) <= 1000),
           shc AS (SELECT sh.* FROM sh JOIN keep USING (shingle)),
           sizes AS (SELECT id, count(*) AS n_sh FROM shc GROUP BY id),
           common AS (
             SELECT a.id AS id1, b.id AS id2, count(*) AS n_common
             FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.id < b.id
             GROUP BY a.id, b.id),
           cj AS (SELECT c.id1, c.id2, c.n_common,
                         s1.n_sh AS n1, s2.n_sh AS n2
                  FROM common c
                  JOIN sizes s1 ON s1.id = c.id1
                  JOIN sizes s2 ON s2.id = c.id2),
           dir AS (
             SELECT id1 AS id_contained, id2 AS id_container, n_common,
                    CAST(n_common AS DOUBLE) / n1 AS containment FROM cj
             UNION ALL
             SELECT id2 AS id_contained, id1 AS id_container, n_common,
                    CAST(n_common AS DOUBLE) / n2 AS containment FROM cj)
           SELECT id_contained, id_container, n_common, containment
           FROM dir WHERE containment > 0.8
           ORDER BY id_contained, id_container"""),

    "dedup_keep_list" ->
      (s"""WITH RECURSIVE $tokCte, $shCte, $jpCte, $ccCte
          SELECT d.doc_id,
                 COALESCE(lab.cluster_id, d.doc_id) AS canonical_id,
                 COALESCE(lab.cluster_id, d.doc_id) = d.doc_id AS keep
          FROM documents d LEFT JOIN lab ON lab.id = d.doc_id
          ORDER BY d.doc_id"""),

    "dedup_minhash_lsh" ->
      (s"""WITH $tokCte, $shCte,
          dict AS (SELECT shingle, dense_rank() OVER (ORDER BY shingle) AS sid
                   FROM (SELECT DISTINCT shingle FROM sh)),
          enc AS (SELECT sh.id, dict.sid FROM sh JOIN dict USING (shingle)),
          params AS (SELECT range AS k, range*2+3 AS a, range*5+7 AS b FROM range(16)),
          mh AS (SELECT enc.id, params.k,
                        min((params.a * enc.sid + params.b) % 100003) AS minhash
                 FROM enc CROSS JOIN params GROUP BY enc.id, params.k),
          banded AS (SELECT id, CAST(k // 2 AS INT) AS band,
                            string_agg(CAST(minhash AS VARCHAR), '-' ORDER BY k) AS sig
                     FROM mh GROUP BY id, k // 2)
          SELECT DISTINCT l.id AS id1, r.id AS id2
          FROM banded l JOIN banded r
            ON l.band = r.band AND l.sig = r.sig AND l.id < r.id
          ORDER BY id1, id2"""),

    "dedup_simhash" ->
      (s"""WITH $tokCte, $shCte,
          dict AS (SELECT shingle, dense_rank() OVER (ORDER BY shingle) AS sid
                   FROM (SELECT DISTINCT shingle FROM sh)),
          enc AS (SELECT sh.id, dict.sid FROM sh JOIN dict USING (shingle)),
          bits AS (SELECT range AS b FROM range(32)),
          contrib AS (SELECT enc.id, bits.b,
                             SUM(((enc.sid * (bits.b*2+3) + (bits.b*3+1)) % 100003 % 2) * 2 - 1) AS s
                      FROM enc CROSS JOIN bits GROUP BY enc.id, bits.b),
          sk AS (SELECT id,
                        SUM(CASE WHEN s > 0 THEN (1::BIGINT << CAST(b AS INT)) ELSE 0 END) AS simhash
                 FROM contrib GROUP BY id)
          SELECT a.id AS id1, b.id AS id2,
                 CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
          FROM sk a JOIN sk b ON a.id < b.id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
          ORDER BY id1, id2"""),

    "dedup_embed_cosine" ->
      """WITH v AS (
           SELECT vec_id, embedding::DOUBLE[] AS vd FROM embeddings
         ),
         n AS (
           SELECT vec_id, vd,
                  sqrt(list_reduce(list_transform(vd, (x,i) -> x * vd[i]),
                                   (a,b) -> a + b)) AS nrm
           FROM v
         )
         SELECT a.vec_id AS id1, b.vec_id AS id2,
                list_reduce(list_transform(a.vd, (x,i) -> x * b.vd[i]),
                            (p,q) -> p + q) / (a.nrm * b.nrm) AS cosine
         FROM n a JOIN n b ON a.vec_id < b.vec_id
         WHERE list_reduce(list_transform(a.vd, (x,i) -> x * b.vd[i]),
                           (p,q) -> p + q) / (a.nrm * b.nrm) > 0.35
         ORDER BY id1, id2""",

    // the exhaustive SemDeDup twin: the dedup_embed_cosine pair set fed
    // through the shared CC label rule (min reachable id), keepers =
    // label owners; every vector gets a row (singletons keep trivially)
    "dedup_semantic_exhaustive" ->
      """WITH RECURSIVE v AS (
           SELECT vec_id, embedding::DOUBLE[] AS vd FROM embeddings
         ),
         n AS (
           SELECT vec_id, vd,
                  sqrt(list_reduce(list_transform(vd, (x,i) -> x * vd[i]),
                                   (a,b) -> a + b)) AS nrm
           FROM v
         ),
         jp AS (
           SELECT a.vec_id AS id1, b.vec_id AS id2
           FROM n a JOIN n b ON a.vec_id < b.vec_id
           WHERE list_reduce(list_transform(a.vd, (x,i) -> x * b.vd[i]),
                             (p,q) -> p + q) / (a.nrm * b.nrm) > 0.35
         ),
         edges AS (SELECT id1 AS a, id2 AS b FROM jp
                   UNION SELECT id2, id1 FROM jp),
         reach AS (
           SELECT a, b FROM edges
           UNION
           SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         lab AS (SELECT a AS id, least(a, min(b)) AS cluster_id
                 FROM reach GROUP BY a)
         SELECT v.vec_id,
                coalesce(lab.cluster_id, v.vec_id) AS semantic_id,
                coalesce(lab.cluster_id, v.vec_id) = v.vec_id AS keep
         FROM v LEFT JOIN lab ON v.vec_id = lab.id
         ORDER BY v.vec_id""",

    "text_langid" ->
      (s"""WITH $tokCte
          SELECT doc_id,
                 len(list_filter(ts, t -> list_contains($enList, t))) AS score_en,
                 len(list_filter(ts, t -> list_contains($esList, t))) AS score_es,
                 len(list_filter(ts, t -> list_contains($deList, t))) AS score_de,
                 CASE WHEN len(list_filter(ts, t -> list_contains($enList, t))) >=
                           len(list_filter(ts, t -> list_contains($esList, t)))
                       AND len(list_filter(ts, t -> list_contains($enList, t))) >=
                           len(list_filter(ts, t -> list_contains($deList, t)))
                       AND len(list_filter(ts, t -> list_contains($enList, t))) > 0
                      THEN 'en'
                      WHEN len(list_filter(ts, t -> list_contains($esList, t))) >=
                           len(list_filter(ts, t -> list_contains($deList, t)))
                       AND len(list_filter(ts, t -> list_contains($esList, t))) > 0
                      THEN 'es'
                      WHEN len(list_filter(ts, t -> list_contains($deList, t))) > 0
                      THEN 'de'
                      ELSE 'unknown' END AS lang_pred
          FROM tok ORDER BY doc_id"""),

    "text_quality" ->
      (s"""WITH $tokCte
          SELECT doc_id,
                 len(ts) AS n_tokens,
                 length(text) AS n_chars,
                 len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
                 len(list_filter(ts, t -> list_contains($enList, t))) AS n_stopwords,
                 CAST(length(text) - len(ts) + 1 AS DOUBLE) / len(ts) AS avg_token_len,
                 CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE) / length(text) AS punct_ratio,
                 CAST(len(list_filter(ts, t -> list_contains($enList, t))) AS DOUBLE) / len(ts) AS stopword_ratio
          FROM tok ORDER BY doc_id"""),

    "text_tokens" ->
      (s"""WITH $tokCte
          SELECT doc_id,
                 len(ts) AS n_ws_tokens,
                 len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n\\x0B\\f\\r]')) AS n_bpe_tokens,
                 ${graft.text.Bpe.oracleNTokensExpr("coalesce(text, '')")}
                   AS n_subwords
          FROM tok ORDER BY doc_id"""),

    "text_fingerprint" ->
      (s"""WITH $tokCte
          SELECT doc_id,
                 list_reduce(
                   list_transform(ts, (x, i) ->
                     CAST(i AS BIGINT) *
                     (length(x) * 131 + ascii(x) * 31 + ascii(substr(x, -1, 1)))),
                   (a, b) -> (a + b) % 2147483647) AS fingerprint
          FROM tok ORDER BY doc_id"""),

    "text_redact" ->
      """WITH dirty AS (
           SELECT doc_id,
                  text
                  || CASE WHEN doc_id % 5 = 0
                          THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                          ELSE '' END
                  || CASE WHEN doc_id % 7 = 0
                          THEN ' see https://example.org/d' || CAST(doc_id AS VARCHAR)
                          ELSE '' END
                  || CASE WHEN doc_id % 3 = 0
                          THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                          ELSE '' END
                  || CASE WHEN doc_id % 11 = 0
                          THEN ' host 192.168.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 250 AS VARCHAR)
                          ELSE '' END AS t
           FROM documents),
         red AS (
           SELECT doc_id,
                  regexp_replace(
                    regexp_replace(
                      regexp_replace(
                        regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                        'https?://[A-Za-z0-9./_%?=&#:~+-]+', '<URL>', 'g'),
                      '\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}(-[0-9]{1,4})?', '<PHONE>', 'g'),
                    '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g') AS redacted
           FROM dirty)
         SELECT doc_id,
                CAST(len(regexp_extract_all(redacted, '<EMAIL>')) AS INT) AS n_emails,
                CAST(len(regexp_extract_all(redacted, '<URL>')) AS INT) AS n_urls,
                CAST(len(regexp_extract_all(redacted, '<PHONE>')) AS INT) AS n_phones,
                CAST(len(regexp_extract_all(redacted, '<IP>')) AS INT) AS n_ips,
                redacted
         FROM red ORDER BY doc_id""",

    "text_quantiles" ->
      (s"""SELECT lang,
                  quantile_cont(nb, 0.25) AS p25,
                  quantile_cont(nb, 0.5) AS p50,
                  quantile_cont(nb, 0.75) AS p75,
                  count(*) AS n
           FROM (SELECT lang,
                        len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n\\x0B\\f\\r]')) AS nb
                 FROM documents)
           GROUP BY lang ORDER BY lang"""),

    "text_repetition" ->
      (s"""WITH $tokCte,
          g AS (
            SELECT doc_id,
                   list_filter(
                     [array_to_string(ts[i:i+2], ' ')
                      for i in range(1, greatest(len(ts)-2, 1) + 1)],
                     x -> length(x) > 0) AS gs
            FROM tok)
          SELECT doc_id,
                 CAST(len(gs) AS INT) AS n_grams,
                 CAST(len(list_distinct(gs)) AS INT) AS n_distinct_grams,
                 CASE WHEN len(gs) > 0
                      THEN CAST(len(gs) - len(list_distinct(gs)) AS DOUBLE) / len(gs)
                      ELSE 0.0 END AS dup_gram_frac
          FROM g ORDER BY doc_id"""),

    "text_quality_gate" ->
      (s"""WITH $tokCte,
          m AS (
            SELECT doc_id,
                   CAST(len(ts) AS INT) AS n_words,
                   CASE WHEN len(ts) > 0
                        THEN CAST(list_sum(list_transform(ts, w -> length(w))) AS DOUBLE) / len(ts)
                        ELSE 0.0 END AS mean_word_len,
                   CASE WHEN length(text) > 0
                        THEN CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE) / length(text)
                        ELSE 0.0 END AS symbol_ratio
            FROM tok)
          SELECT doc_id, n_words, mean_word_len, symbol_ratio,
                 (n_words BETWEEN 30 AND 10000)
                   AND (mean_word_len BETWEEN 3.0 AND 10.0)
                   AND (symbol_ratio <= 0.1) AS keep
          FROM m ORDER BY doc_id"""),

    // lift = (nab·N as exact BIGINT product) / (na·nb as exact BIGINT
    // product) — ONE IEEE division, same operand association as the
    // Spark side; ranking identical to PMI (log is monotone)
    "text_collocations" ->
      """WITH tk AS (
           SELECT list_filter(string_split(trim(text), ' '),
                  t -> t <> '') AS ts
           FROM documents),
         toks AS (SELECT unnest(ts) AS tok FROM tk),
         uni AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
         tot AS (SELECT count(*) AS n FROM toks),
         bi AS (
           SELECT p.a AS a, p.b AS b, count(*) AS n_ab FROM (
             SELECT unnest([struct_pack(a := ts[i], b := ts[i + 1])
                            for i in range(1, len(ts))]) AS p
             FROM tk WHERE len(ts) >= 2)
           GROUP BY p.a, p.b
           HAVING count(*) >= 5)
         SELECT a, b, n_ab, ua.n AS n_a, ub.n AS n_b,
                CAST(n_ab * tot.n AS DOUBLE)
                  / CAST(ua.n * ub.n AS DOUBLE) AS lift
         FROM bi JOIN uni ua ON bi.a = ua.tok
                 JOIN uni ub ON bi.b = ub.tok, tot
         ORDER BY lift DESC, a, b
         LIMIT 100""",

    "vocab_topk" ->
      (s"""WITH $tokCte
          SELECT token, count(*) AS n
          FROM (SELECT unnest(ts) AS token FROM tok)
          WHERE token <> ''
          GROUP BY token
          ORDER BY n DESC, token
          LIMIT 500"""),

    // 2^24 grid snap: power-of-two multiply is IEEE-exact, floor is
    // unambiguous, integer sums are order-free — see labelCentroids
    "emb_centroids" ->
      """WITH x AS (
           SELECT label,
                  unnest(list_transform(embedding,
                    (v, i) -> struct_pack(pos := i - 1, x := CAST(v AS DOUBLE)))) AS u
           FROM embeddings)
         SELECT label,
                CAST(u.pos AS INT) AS pos,
                CAST(SUM(CAST(floor(u.x * 16777216.0) AS BIGINT)) AS DOUBLE)
                  / (count(*) * 16777216.0) AS mean_x,
                count(*) AS n
         FROM x GROUP BY label, u.pos
         ORDER BY label, pos""",

    // same 2^24 grid, shifted +2^24 so every value is nonnegative
    // (shift-invariant distances; truncating // ≡ floor there);
    // centroid coordinate is the round-half-up integer (2s+n)//(2n);
    // distances are pure BIGINT sums of squares — argmin exact, ties
    // to the lowest label
    "emb_nn_classify" ->
      """WITH x AS (
           SELECT vec_id, label,
                  list_transform(embedding,
                    v -> CAST(floor(CAST(v AS DOUBLE) * 16777216.0)
                           AS BIGINT) + 16777216) AS gv
           FROM embeddings),
         e AS (
           SELECT vec_id, label, u.pos AS pos, u.x AS x FROM (
             SELECT vec_id, label,
                    unnest(list_transform(gv, (v, i) ->
                      struct_pack(pos := i - 1, x := v))) AS u
             FROM x)),
         c AS (
           SELECT label AS c_label, pos,
                  CAST((2 * sum(x) + count(*)) // (2 * count(*))
                    AS BIGINT) AS cx
           FROM e GROUP BY label, pos),
         d AS (
           SELECT e.vec_id, e.label, c.c_label,
                  CAST(sum((e.x - c.cx) * (e.x - c.cx)) AS BIGINT)
                    AS dist_sq
           FROM e JOIN c ON e.pos = c.pos
           GROUP BY e.vec_id, e.label, c.c_label),
         r AS (
           SELECT vec_id, label, c_label, dist_sq,
                  row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dist_sq, c_label) AS rn
           FROM d)
         SELECT vec_id, label, c_label AS pred_label, dist_sq,
                CASE WHEN label = c_label THEN 1 ELSE 0 END AS is_correct
         FROM r WHERE rn = 1
         ORDER BY vec_id""",

    "sim_cosine_topk" -> cosineTopkOracle,

    // Exhaustive-mode ANN entries reduce to the same exact-top-k truth.
    // mirrors pqTopKPinned stage-for-stage: int8 quantization (the
    // emb_quantize rule), per-subspace argmin against the pinned
    // codebook (list_position-of-min ≡ nearest()'s lowest-tie), LUT
    // inner products, Σ_j lookup — all BIGINT-exact. m=8, ksub=16,
    // ds=8, scale=64, k=10.
    "sim_pq_pinned" -> {
      def cb(j: String, c: String, i: String) =
        graft.sim.Pq.pinnedCbSql(j, c, i)
      def dists =
        s"""list_transform(range(16), c ->
              list_sum(list_transform(
                list_transform(range(8), i ->
                  q8[CAST(j*8 + i + 1 AS INT)] - (${cb("j", "c", "i")})),
                dd -> dd * dd)))"""
      s"""WITH qc AS (
           SELECT vec_id,
                  list_transform(embedding::DOUBLE[], x ->
                    CAST(greatest(-128, least(127, floor(x * 64)))
                         AS BIGINT)) AS q8
           FROM embeddings
         ),
         enc AS (
           SELECT vec_id,
                  list_transform(range(8), j ->
                    list_position($dists, list_min($dists)) - 1) AS codes
           FROM qc
         ),
         scored AS (
           SELECT q.vec_id AS query_id, e.vec_id AS cand_id,
                  CAST(list_sum(list_transform(range(8), j ->
                    list_sum(list_transform(range(8), i ->
                      q.q8[CAST(j*8 + i + 1 AS INT)] *
                        (${cb("j", "e.codes[CAST(j + 1 AS INT)]", "i")})))))
                    AS BIGINT) AS score
           FROM qc q JOIN enc e ON q.vec_id <> e.vec_id
           WHERE q.vec_id % 50 = 0
         )
         SELECT query_id, rank, cand_id, score
         FROM (SELECT *, CAST(row_number() OVER (
                 PARTITION BY query_id ORDER BY score DESC, cand_id)
                 AS INT) AS rank
               FROM scored)
         WHERE rank <= 10
         ORDER BY query_id, rank"""
    },

    "sim_ivf_exhaustive" -> cosineTopkOracle,
    "sim_ivf_append_exhaustive" -> cosineTopkOracle,
    "sim_lsh_exhaustive" -> cosineTopkOracle,
    "sim_pq_exhaustive"  -> cosineTopkOracle,

    // both entries recompute the fixture set from documents (the same
    // planting rule that wrote the files), so the whole binaryFile
    // read-back path — path parsing, type mapping, payload bytes — is
    // hash-checked, not just row-counted
    "mm_binary_ingest" ->
      """WITH f AS (
           SELECT doc_id AS asset_id, doc_id AS src_id, text
           FROM documents WHERE doc_id % 25 = 0
           UNION ALL
           SELECT doc_id + 100000 AS asset_id, doc_id AS src_id, text
           FROM documents WHERE doc_id % 50 = 0)
         SELECT asset_id,
                CASE WHEN src_id % 3 = 0 THEN 'video'
                     WHEN src_id % 3 = 1 THEN 'image'
                     ELSE 'audio' END AS media_type,
                CAST(octet_length(encode(text)) AS INT) AS n_bytes
         FROM f ORDER BY asset_id""",

    "mm_dedup_exact" ->
      """WITH f AS (
           SELECT doc_id AS asset_id, text
           FROM documents WHERE doc_id % 25 = 0
           UNION ALL
           SELECT doc_id + 100000 AS asset_id, text
           FROM documents WHERE doc_id % 50 = 0),
         g AS (SELECT min(asset_id) AS canonical_id,
                      CAST(octet_length(encode(text)) AS INT) AS n_bytes,
                      count(*) AS n_copies,
                      array_to_string(list(CAST(asset_id AS VARCHAR)
                        ORDER BY asset_id), ',') AS member_ids
               FROM f GROUP BY text)
         SELECT canonical_id, n_bytes, n_copies, member_ids
         FROM g ORDER BY canonical_id""",

    // mirrors the imageFixtureDir planting formula: header bytes carry
    // width = id%640+1, height = id*7%480+1; n_bytes = header length
    // (33 PNG / 39 JPEG, MediaHeaders.*HeaderLen) + the text tail
    "mm_decode_image" ->
      """SELECT doc_id AS asset_id, 'image' AS media_type,
                CAST(CASE WHEN doc_id % 50 = 0 THEN 39 ELSE 33 END
                     + octet_length(encode(coalesce(text, ''))) AS INT)
                  AS n_bytes,
                CAST(doc_id % 640 + 1 AS INT) AS width,
                CAST(doc_id * 7 % 480 + 1 AS INT) AS height,
                CAST(1 AS INT) AS n_frames,
                CAST(1 AS INT) AS n_sampled_frames
         FROM documents WHERE doc_id % 25 = 0
         ORDER BY asset_id""",

    "mm_decode_meta" ->
      """SELECT doc_id AS asset_id,
                CASE WHEN doc_id % 3 = 0 THEN 'video'
                     WHEN doc_id % 3 = 1 THEN 'image'
                     ELSE 'audio' END AS media_type,
                CAST(octet_length(encode(text)) AS INT) AS n_bytes,
                CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width,
                CAST((octet_length(encode(text)) * 7) % 480 + 1 AS INT) AS height,
                CAST(CASE WHEN doc_id % 3 = 0
                          THEN octet_length(encode(text)) % 30 + 1
                          ELSE 1 END AS INT) AS n_frames,
                CAST((CASE WHEN doc_id % 3 = 0
                           THEN octet_length(encode(text)) % 30 + 1
                           ELSE 1 END + 4) // 5 AS INT) AS n_sampled_frames
         FROM documents ORDER BY asset_id"""
  )

  private lazy val decontaminateOracle: String =
    s"""WITH $tokCte, $shCte,
        bench AS (SELECT DISTINCT shingle FROM sh WHERE id % 97 = 0),
        flagged AS (
          SELECT DISTINCT id FROM sh
          WHERE id % 97 <> 0
            AND shingle IN (SELECT shingle FROM bench))
        SELECT d.doc_id, (f.id IS NOT NULL) AS contaminated
        FROM documents d LEFT JOIN flagged f ON f.id = d.doc_id
        WHERE d.doc_id % 97 <> 0
        ORDER BY d.doc_id"""

  private lazy val cosineTopkOracle: String =
      """WITH v AS (
           SELECT vec_id, embedding::DOUBLE[] AS vd FROM embeddings
         ),
         n AS (
           SELECT vec_id, vd,
                  sqrt(list_reduce(list_transform(vd, (x,i) -> x * vd[i]),
                                   (a,b) -> a + b)) AS nrm
           FROM v
         ),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                  list_reduce(list_transform(q.vd, (x,i) -> x * c.vd[i]),
                              (p,s) -> p + s) / (q.nrm * c.nrm) AS cosine
           FROM n q JOIN n c ON q.vec_id <> c.vec_id
           WHERE q.vec_id % 50 = 0
         )
         SELECT query_id, rank, cand_id, cosine
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
               FROM scored)
         WHERE rank <= 10
         ORDER BY query_id, rank"""
}

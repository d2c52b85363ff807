package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy entity matching — edit-distance join with candidate
  * blocking, the entity-resolution shape (dirty names ↔ master
  * table) that document-level dedup does not cover: the join key
  * itself is corrupted, so equality joins find nothing and all-pairs
  * Levenshtein is quadratic.
  *
  * Two blocking families, composable in one call:
  *   - POSITIONAL `(pos, len)` substring windows: cheapest (one
  *     8-ish-byte key per row per pass), and by pigeonhole k disjoint
  *     windows guarantee every pair within k−1 SUBSTITUTIONS shares
  *     an intact block — two blocks make single-substitution recall
  *     exact. Insertions/deletions SHIFT every later character, so
  *     positional windows do NOT cover them; rows shorter than a
  *     window are excluded from that pass (never keyed on a truncated
  *     or empty block — an empty-string key would be an all-pairs hot
  *     block).
  *   - Q-GRAM blocking (`qgram = Some(q)`): candidates are pairs
  *     sharing ANY length-q substring — alignment-free, so it covers
  *     insertions and deletions too (any pair within τ edits shares a
  *     q-gram whenever min-length > q·τ — the standard q-gram count
  *     bound). Costs one explode per side and a df-capped gram join —
  *     the same posting-list discipline as the shingle dedup tier;
  *     `maxGramDf` drops ubiquitous grams that carry no selectivity
  *     (they are the fuzzy-join's stop shingles).
  *
  * The expensive confirm (Levenshtein, classic unit-cost — identical
  * in Spark and DuckDB) runs only on blocked candidates, never all
  * pairs; pairs deduplicate BEFORE the confirm so a pair found by
  * several passes scores once. Output is the per-dirty-row arg-min
  * (distance, then master key — deterministic ties), plus the
  * candidate count as an ambiguity signal.
  *
  * CHOOSE POSITIONAL WINDOWS ON HIGH-ENTROPY POSITIONS. A block over
  * near-constant characters (the leading digits of a zero-padded key,
  * a shared prefix like "Customer#") degenerates into one hot key and
  * the pass becomes a near-cross-join: measured 56 s → ~1 s on the
  * registry entry by moving its blocks from the padded prefix to the
  * varying tail digits. Entropy of the window, not its width, bounds
  * the candidate volume.
  */
object FuzzyJoin {

  private def sides(dirty: DataFrame, clean: DataFrame,
      dirtyId: String, dirtyCol: String,
      cleanId: String, cleanCol: String)
      : (DataFrame, DataFrame) = (
    dirty.select(col(dirtyId).as("__did"), col(dirtyCol).as("__dn")),
    clean.select(col(cleanId).as("__cid"), col(cleanCol).as("__cn")))

  /** One positional pass: rows shorter than pos+len−1 are excluded
    * (no truncated/empty keys). */
  private def positionalPass(d: DataFrame, c: DataFrame,
      pos: Int, len: Int): DataFrame = {
    def keyed(df: DataFrame, s: Column) = df
      .withColumn("__bk", substring(s, pos, len))
      .filter(length(col("__bk")) === len)
    keyed(d, col("__dn")).join(keyed(c, col("__cn")), "__bk")
      .select("__did", "__dn", "__cid", "__cn")
  }

  /** One deletion-neighborhood pass (SymSpell-style, public
    * algorithm): each row is keyed by EVERY string obtainable by
    * deleting up to `maxDel` characters from the `(pos, len)` window;
    * two strings within Levenshtein distance τ ≤ maxDel share at
    * least one such signature (delete the τ edit sites from each —
    * the standard deletion-neighborhood guarantee), so recall over
    * the window is EXACT for substitutions AND indels — no alignment
    * assumption, unlike positional windows. Key entropy is the whole
    * window minus maxDel characters, so bucket occupancy stays O(1)
    * on dense key populations where fixed sub-windows saturate
    * (measured on the registry entry: the 100-key `(17,2)` window
    * pass alone materializes n²/100 pairs — 75 M at the 150 k-row
    * stress scale — while the deletion pass stays near-linear).
    * Signature volume is C(len, ≤maxDel) per row (46 for len=9,
    * maxDel=2) — an explode, deduped per row before the join. */
  private def deletionPass(d: DataFrame, c: DataFrame,
      pos: Int, len: Int, maxDel: Int): DataFrame = {
    require(maxDel <= 2,
      "deletion pass supports maxDel ≤ 2; higher τ → q-gram pass")
    // Signatures come from the codegen'd per-row kernel
    // ([[graft.functions.DeletionSignatures]]): each row explodes its
    // ALREADY-DISTINCT ≤2-deletion neighborhood, so the per-row dedup
    // that used to be a `dropDuplicates(id, sig)` SHUFFLE of the full
    // signature stream on each side (the two largest exchanges of
    // this plan — guide §2.4) happens map-side for free. The earlier
    // escalation note stands: a 46-element array of nested
    // concat(substring…) expression trees blows whole-stage codegen
    // (measured 2.5 s interpreted) — the kernel builds the same
    // values imperatively inside codegen instead.
    def keyed(df: DataFrame, s: Column) = df
      .filter(length(s) >= pos + len - 1)
      .select(col("*"),
        explode(graft.functions.DeletionSignatures.del_signatures(
          substring(s, pos, len), len)).as("__bk"))
    // One explicit exchange on the join key (the probe side): the join
    // needs the __bk partitioning anyway unless the master side
    // broadcasts, and when it DOES broadcast, this is what spreads the
    // signature probe + Levenshtein confirm across cores instead of
    // riding the scan's partitioning (a single-file scan otherwise
    // pins the whole confirm to one task). Net plan: ≤1 exchange
    // before the join vs r20's two dropDuplicates exchanges.
    keyed(d, col("__dn")).repartition(col("__bk"))
      // SHUFFLE_HASH, not broadcast: the exploded master-side
      // signature stream is C(len,≤2)× its row count — Catalyst's
      // size estimate under a Generate is row-count-blind, so it
      // broadcasts ~46× the master table (measured: the broadcast
      // build dominated the join job). A shuffled hash join exchanges
      // the stream once and builds per-partition tables instead —
      // also the only shape that scales when the master side is a
      // full entity table at 100 TB.
      .join(keyed(c, col("__cn")).hint("shuffle_hash"), "__bk")
      .select("__did", "__dn", "__cid", "__cn")
  }

  /** One q-gram pass: pairs sharing any (df-capped) q-gram. Strings
    * shorter than q produce no grams (the length guard is
    * load-bearing: an unguarded sequence(1, 0) REVERSES). */
  private def qgramPass(d: DataFrame, c: DataFrame, q: Int,
      maxGramDf: Int): DataFrame = {
    def grams(df: DataFrame, cn: String) = df.select(col("*"),
        explode(expr(
          s"CASE WHEN length($cn) >= $q THEN " +
          s"transform(sequence(1, length($cn) - ${q - 1}), " +
          s"i -> substring($cn, i, $q)) ELSE array() END")).as("__g"))
      .distinct()
    val dg = grams(d, "__dn")
    val cg = grams(c, "__cn")
    // stop-gram cap on the MASTER side (the side that repeats)
    val hot = cg.groupBy("__g").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxGramDf).select("__g")
    dg.join(cg.join(hot, Seq("__g"), "left_anti"), "__g")
      .select("__did", "__dn", "__cid", "__cn").distinct()
  }

  /** Best master match per dirty row: (dirtyId, matched_key,
    * edit_dist, n_candidates), inner — dirty rows with no candidate
    * within `tau` are absent. `blocks` are 1-based (pos, len)
    * substring windows; `qgram` adds an alignment-free q-gram pass
    * (indel coverage) with ubiquitous grams dropped past
    * `maxGramDf`; `delBlock` adds a deletion-neighborhood pass over a
    * (pos, len) window — exact ≤tau recall over the window (subs and
    * indels) with near-linear candidate volume, the right blocking
    * when the discriminating region is a dense identifier. */
  def bestMatch(dirty: DataFrame, clean: DataFrame,
      dirtyId: String, dirtyCol: String,
      cleanId: String, cleanCol: String,
      blocks: Seq[(Int, Int)], tau: Int,
      qgram: Option[Int] = None, maxGramDf: Int = 1000,
      delBlock: Option[(Int, Int)] = None): DataFrame = {
    require(blocks.nonEmpty || qgram.nonEmpty || delBlock.nonEmpty,
      "need at least one blocking pass")
    require(tau >= 0, "tau must be ≥ 0")
    qgram.foreach(q => require(q >= 2, "qgram must be ≥ 2"))
    val (d, c) = sides(dirty, clean, dirtyId, dirtyCol,
      cleanId, cleanCol)
    val passes =
      blocks.map { case (p, l) => positionalPass(d, c, p, l) } ++
        qgram.map(q => qgramPass(d, c, q, maxGramDf)).toSeq ++
        delBlock.map { case (p, l) => deletionPass(d, c, p, l, tau) }.toSeq
    // Confirm BEFORE deduplicating: the Levenshtein is a codegen'd
    // map-side filter, so running it on raw (possibly multi-pass
    // duplicated) candidates costs no shuffle, while it prunes the
    // candidate stream to the τ-close pairs — the pair-distinct then
    // exchanges only that small set instead of every blocked pair
    // (measured 12.7 s → 1.6 s on the registry entry at sf0.1;
    // dist is a pure pair function, so filter∘distinct ≡
    // distinct∘filter and a pair found by several passes still
    // scores once).
    // threshold-bounded Levenshtein: the banded DP exits as soon as
    // the distance provably exceeds tau (returns -1), an O(len·tau)
    // confirm instead of O(len²) — same values on every kept pair
    // ONE conjunct: the threshold-bounded levenshtein returns -1 for
    // any distance > tau, so `>= 0` alone IS the τ-gate — the former
    // `>= 0 && <= tau` pair was folded into the blocking join's
    // condition by predicate pushdown and evaluated the DP TWICE per
    // candidate pair (r21 plan audit).
    passes.reduce(_ unionByName _)
      .withColumn("__dist", levenshtein(col("__dn"), col("__cn"), tau))
      .filter(col("__dist") >= 0)
      .select("__did", "__cid", "__dist").distinct()
      .groupBy("__did")
      .agg(min(struct(col("__dist"), col("__cid"))).as("__m"),
        count(lit(1)).as("n_candidates"))
      .select(col("__did").as(dirtyId),
        col("__m.__cid").as("matched_key"),
        col("__m.__dist").as("edit_dist"),
        col("n_candidates"))
  }
}

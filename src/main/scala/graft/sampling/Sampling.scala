package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and splitting for training-data pipelines:
  * hash-based train/test assignment, per-group stratified sampling, and
  * per-group balanced downsampling.
  *
  * All three key every decision on `md5(salt || id)` — a content-free,
  * engine-portable hash — so results are reproducible run-to-run,
  * independent of partitioning and row order, and stable under corpus
  * growth (adding documents never flips an existing document's split,
  * the property that keeps eval sets uncontaminated across dataset
  * versions). A salt change is a fresh independent assignment.
  *
  * Scale shape: [[hashSplit]] is a pure projection (no shuffle).
  * [[stratifiedSample]] / [[balancedSample]] shuffle once on the group
  * key and stream each group through a ranking window (row_number over
  * a sort — no per-group buffering). Group skew equals data skew: a
  * 100 TB corpus with a dominant group sorts that group across its
  * partition; if a single group outgrows a partition, pre-split it
  * with a salted secondary key and cap per-salt, or switch the
  * per-group quota to a threshold on the hash itself (quantile cut,
  * no count pass) — both are one-line variants of the same hash order.
  */
object Sampling {

  /** Hex md5 of (salt ++ id), the shared sort/assignment key. */
  def idHash(id: Column, salt: String): Column =
    md5(concat(lit(salt), id.cast("string")))

  /** Output/temp names are reserved: an input already carrying one
    * would be silently overwritten (withColumn replaces) or dropped —
    * fail fast instead. (Shared with [[graft.text.Packing]], which has
    * the same reserved-name contract.) */
  private[graft] def requireFresh(df: DataFrame, names: String*): Unit = {
    val clash = names.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input already has reserved output/temp column(s) " +
        s"${clash.mkString("'", "', '", "'")} — rename before calling")
  }

  /** A fraction as a 4-hex-digit md5-prefix threshold (16-bit
    * quantization, shared by [[hashSplit]] and [[weightedMix]]).
    * Rejects fractions that quantize to zero — they would silently
    * keep no rows at all. */
  private def quantHex(frac: Double): String = {
    val q = (frac * 65536).toInt
    require(q >= 1,
      f"fraction $frac quantizes to zero at 16-bit resolution " +
        "(minimum representable is 1/65536)")
    f"$q%04x"
  }

  /** Split assignment from the first 4 hex digits (16-bit quantization:
    * the train fraction is realized as ⌊frac·65536⌋/65536). Appending
    * rows never changes existing assignments. */
  def hashSplit(df: DataFrame, idCol: String, trainFrac: Double,
      salt: String = "split"): DataFrame = {
    require(trainFrac > 0 && trainFrac < 1, "trainFrac must be in (0,1)")
    requireFresh(df, "split")
    val threshold = quantHex(trainFrac)
    df.withColumn("split",
      when(substring(idHash(col(idCol), salt), 1, 4) < lit(threshold),
        lit("train")).otherwise(lit("test")))
  }

  /** Per-group fraction `frac`, exact per group (⌈frac·|group|⌉ rows),
    * members chosen by hash order — a stratified sample that preserves
    * group proportions. One shuffle on `groupCol`. */
  def stratifiedSample(df: DataFrame, groupCol: String, idCol: String,
      frac: Double, salt: String = "strat"): DataFrame = {
    require(frac > 0 && frac <= 1, "frac must be in (0,1]")
    requireFresh(df, "__rn", "__n")
    val w = Window.partitionBy(groupCol)
      .orderBy(idHash(col(idCol), salt), col(idCol))
    val cnt = Window.partitionBy(groupCol)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(cnt))
      .filter(col("__rn") <= ceil(col("__n") * frac))
      .drop("__rn", "__n")
  }

  /** Weighted dataset mix: each source keeps a deterministic
    * hash-fraction of its rows (weight ∈ (0, 1]; 16-bit quantized like
    * [[hashSplit]]) and is tagged with its index in `mix_source` —
    * the "blend N corpora at target rates" step of data mixing. Each
    * source uses an index-derived salt, so a row id present in several
    * sources draws independently per source. Pure projection + union:
    * no shuffle, no count pass, stable under per-source growth. */
  def weightedMix(sources: Seq[(DataFrame, Double)], idCol: String,
      salt: String = "mix"): DataFrame = {
    require(sources.nonEmpty, "weightedMix needs at least one source")
    sources.zipWithIndex.map { case ((df, w), i) =>
      require(w > 0 && w <= 1, s"weight must be in (0,1], got $w")
      requireFresh(df, "mix_source")
      val tagged = df.withColumn("mix_source", lit(i))
      if (w == 1.0) tagged   // 'ffff' < '10000' is false lexicographically
      else tagged.filter(
        substring(idHash(col(idCol), s"$salt$i"), 1, 4) < lit(quantHex(w)))
    }.reduce(_ unionByName _)
  }

  /** Temperature-flattened group mix at α = 0.5: group `g` keeps a
    * hash-fraction rate_g = √(n_g / n_max) of its rows — the standard
    * "raise rare languages/domains, cap the dominant one" rebalance
    * (multilingual-pretraining temperature sampling), at the one α
    * whose power function (sqrt) IEEE-754 requires to be correctly
    * rounded, so the per-group thresholds are bit-identical across
    * engines and the whole decision is oracle-checkable. (General α
    * via `pow` works identically but `pow` is not correctly-rounded,
    * so cross-engine conformance would need a quantized-rate table.)
    *
    * Scale: the rate table is one row per group (metadata-scale,
    * broadcast); the corpus itself is touched by one counting pass and
    * one filtering pass, both shuffle-free on the big side. */
  def temperatureSqrtMix(df: DataFrame, groupCol: String, idCol: String,
      salt: String = "temp"): DataFrame = {
    requireFresh(df, "__n", "__nmax", "__thr")
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("__n"))
    val mx = counts.agg(max(col("__n")).as("__nmax"))
    // 16-bit quantized threshold as a 4-hex string (same comparison
    // convention as hashSplit); rate < 1 whenever __n < __nmax, so the
    // floor is always <= 65535 and 4 hex digits suffice
    // clamp to [1, 65535]: the upper clamp matters because n/nmax can
    // ROUND to 1.0 for n = nmax-1 at huge nmax, and hex(65536) is 5
    // digits (lpad truncates, silently corrupting the threshold)
    val rates = counts.crossJoin(broadcast(mx)).withColumn("__thr",
      lower(lpad(hex(least(lit(65535L), greatest(lit(1L),
        floor(sqrt(col("__n").cast("double") / col("__nmax")) * 65536)))),
        4, "0")))
    df.join(broadcast(rates), groupCol)
      .filter(col("__n") === col("__nmax") ||   // rate 1: keep all
        substring(idHash(col(idCol), salt), 1, 4) < col("__thr"))
      .drop("__n", "__nmax", "__thr")
  }

  /** Temperature-flattened group mix at a general rational α = p/q:
    * group `g` keeps a hash-fraction rate_g = (n_g / n_max)^α of its
    * rows. Unlike [[temperatureSqrtMix]] (α = 0.5, the one power IEEE
    * requires correctly rounded), general α cannot lean on floating
    * `pow` — its rounding is engine-specific, so a threshold computed
    * with `pow` is not reproducible bit-for-bit across engines. This
    * operator instead derives a QUANTIZED-RATE TABLE with pure integer
    * arithmetic, which any engine with 128-bit integers (or 38-digit
    * decimals) reproduces exactly:
    *
    *   - ratio quantization:  r_g = ⌊2^b · n_g / n_max⌋  (integer div)
    *   - threshold:  t_g = max{ t ∈ [1, 2^a] :
    *                            t^q · 2^(b·p) ≤ 2^(a·q) · r_g^p }
    *     ≡ ⌊2^a · (r_g / 2^b)^(p/q)⌋ clamped to ≥ 1 — found by a
    *     broadcast grid probe (2^a rows × #groups, metadata-scale),
    *     no root-finding and no floating point anywhere
    *   - keep iff group is the max group (rate 1) or the row's 16-bit
    *     md5 prefix < t_g · 2^(16-a)
    *
    * Resolutions are α-adaptive so every product stays below 2^126
    * (fits DECIMAL(38,0) and two's-complement 128-bit):
    * a = min(16, (126 − 8p) / q) threshold bits, b = min(32,
    * (126 − a·q) / p) ratio bits. For α = 7/10 that is a=7, b=8
    * (rate granularity 1/128); for α = 1/2 it is a=16, b=32, where the
    * rule degenerates to t = isqrt(⌊2^32·n/nmax⌋) = ⌊2^16·√(n/nmax)⌋ —
    * the same thresholds as [[temperatureSqrtMix]] (parity is pinned in
    * SamplingSpec).
    *
    * Output carries the realized rate table as a `rate_q` column
    * (t_g, i.e. ⌊rate·2^a⌋) so downstream consumers — and the DuckDB
    * oracle — can verify the thresholds rather than trust them.
    *
    * Scale: identical shape to [[temperatureSqrtMix]] — one counting
    * pass, a metadata-scale broadcast rate table (the grid probe is
    * #groups · 2^a rows, driver-free), one shuffle-free filtering pass.
    */
  def temperatureMix(df: DataFrame, groupCol: String, idCol: String,
      alphaNum: Int, alphaDen: Int, salt: String = "tempa"): DataFrame = {
    require(alphaNum >= 1 && alphaDen >= 1,
      s"alpha must be a positive rational, got $alphaNum/$alphaDen")
    val g = BigInt(alphaNum).gcd(BigInt(alphaDen)).toInt
    val (p, q) = (alphaNum / g, alphaDen / g)
    val a = math.min(16, (126 - 8 * p) / q)
    require(a >= 4,
      s"alpha $p/$q needs threshold resolution < 4 bits to stay inside " +
        "128-bit arithmetic — quantization would be meaninglessly coarse")
    val b = math.min(32, (126 - a * q) / p)
    requireFresh(df, "__n", "__nmax", "__rq", "__tq", "__thr", "rate_q")

    def dec(x: BigInt): Column =
      lit(new java.math.BigDecimal(x.bigInteger)).cast("decimal(38,0)")
    // exact small-exponent power: a left-associated multiply chain whose
    // intermediates are all ≤ the final value, which the resolution rule
    // keeps < 2^126 < 10^38 (so DECIMAL(38,0) never overflows)
    def ipow(c: Column, e: Int): Column =
      Iterator.fill(e)(c.cast("decimal(38,0)")).reduce(_ * _)

    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("__n"))
    val mx = counts.agg(max(col("__n")).as("__nmax"))
    val withRatio = counts.crossJoin(broadcast(mx))
      // exact integral division (Spark's `div` on decimal is exact,
      // unlike decimal `/` whose scale-6 rounding could cross a floor)
      .withColumn("__rq",
        expr(s"CAST(__n AS DECIMAL(38,0)) * ${BigInt(2).pow(b)} DIV __nmax"))
    val grid = broadcast(
      df.sparkSession.range(1, (1L << a) + 1).toDF("__t"))
    val tmax = withRatio.join(grid,
        ipow(col("__t"), q) * dec(BigInt(2).pow(b.toInt * p)) <=
          dec(BigInt(2).pow(a * q)) * ipow(col("__rq"), p),
        "left")
      .groupBy(groupCol, "__n", "__nmax")
      // a group whose rate quantizes to zero keeps the minimum
      // representable rate 2^(16-a)/65536 instead of silently vanishing
      // (same convention as quantHex's lower clamp)
      .agg(coalesce(max(col("__t")), lit(1L)).as("__tq"))
    val rates = tmax.withColumn("__thr",
      lower(lpad(hex(col("__tq") * (1L << (16 - a))), 4, "0")))
    df.join(broadcast(rates), groupCol)
      .filter(col("__n") === col("__nmax") ||   // rate 1: keep all
        substring(idHash(col(idCol), salt), 1, 4) < col("__thr"))
      .withColumn("rate_q", col("__tq").cast("int"))
      .drop("__n", "__nmax", "__rq", "__tq", "__thr")
  }

  /** Exactly `n` rows (corpus permitting), chosen by hash order — the
    * "carve a fixed-size eval/calibration set" operator. Unlike
    * [[hashSplit]]'s rate-based membership, a fixed-N sample is
    * necessarily growth-SENSITIVE (new rows can hash below the old
    * n-th rank and displace members); use hashSplit when assignment
    * stability matters more than exact size.
    *
    * Scale: plans as a distributed top-k (TakeOrderedAndProject —
    * per-partition limit, then one n-row merge), never a global sort. */
  def fixedSample(df: DataFrame, idCol: String, n: Int,
      salt: String = "fix"): DataFrame = {
    require(n > 0, "n must be positive")
    df.orderBy(idHash(col(idCol), salt), col(idCol)).limit(n)
  }

  /** Per-group cap: at most `maxPerGroup` rows per group, chosen by
    * hash order — rebalances a skewed group mix (the "downsample the
    * dominant domain" step of a data-mixing pipeline). */
  def balancedSample(df: DataFrame, groupCol: String, idCol: String,
      maxPerGroup: Int, salt: String = "bal"): DataFrame = {
    require(maxPerGroup > 0, "maxPerGroup must be positive")
    requireFresh(df, "__rn")
    val w = Window.partitionBy(groupCol)
      .orderBy(idHash(col(idCol), salt), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerGroup)
      .drop("__rn")
  }

  /** Token-budget mixture plan — the "how much of each domain goes in
    * the training set" table (The Pile / DoReMi-style source weighting
    * at temperature α = 0.5): per source, available tokens, the
    * temperature-flattened share p_s = √(n_s/N) / Σ√(n_t/N), the
    * token allocation ⌊budget · p_s⌋, the realized sample rate, and an
    * oversample flag (rate > 1 means the source must repeat epochs).
    *
    * Determinism: √ is the one power IEEE requires correctly rounded
    * (same convention as [[temperatureSqrtMix]]); the normalizer Σ is
    * an ORDER-PINNED fold over sources sorted by name (sources are a
    * handful of values — the fold is metadata-scale), so every engine
    * reproduces the plan bit-for-bit.
    *
    * Scale: ONE partial-aggregating groupBy over the corpus (the only
    * corpus-wide stage — the plan has exactly one parquet scan);
    * everything downstream runs as window functions over the
    * #sources-row aggregate, whose single-partition window is
    * metadata-scale by construction (a corpus has tens of sources,
    * not millions). */
  def mixturePlan(df: DataFrame, srcCol: String, textCol: String,
      budgetTokens: Long,
      // the token-count seam: whitespace words by default; pass
      // graft.text.Bpe.nTokens-based counts for real subword budgets
      tokenCount: Option[Column] = None): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val nToks =
      tokenCount.getOrElse(size(graft.text.Tokens.ws(col(textCol))))
    val avail = df
      .select(col(srcCol).as("source"), nToks.cast("long").as("__t"))
      .groupBy("source").agg(sum(col("__t")).as("n_tokens"))
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // order-pinned normalizer: fold √-weights sorted by source name
    // (0.0 + w₁ ≡ w₁ for positive weights — same fold convention as
    // the pinned BM25 oracle chain)
    avail
      .withColumn("__w", sqrt(col("n_tokens").cast("double") /
        sum(col("n_tokens")).over(all)))
      .withColumn("__z", aggregate(
        transform(array_sort(
          collect_list(struct(col("source"), col("__w"))).over(all)),
          s => s.getField("__w")),
        lit(0.0), (a, x) => a + x))
      .select(col("source"), col("n_tokens"),
        (col("__w") / col("__z")).as("share"),
        floor(lit(budgetTokens.toDouble) * (col("__w") / col("__z")))
          .cast("long").as("target_tokens"))
      // NULL (not NaN) for an empty source: Spark 0.0/0.0 is NaN but
      // DuckDB integer-division-by-zero is NULL — the guard keeps the
      // cross-engine bit-for-bit claim honest on degenerate corpora
      .withColumn("sample_rate",
        when(col("n_tokens") > 0,
          col("target_tokens").cast("double") / col("n_tokens")))
      .withColumn("oversample",
        when(col("sample_rate") > 1.0, 1).otherwise(0))
  }

  /** Execute a [[mixturePlan]]: materialize the planned per-source
    * allocation as a deterministic multiset of (source, id, epoch)
    * rows — the "epochs per domain" step that turns the plan table
    * into an actual training mix. Each document of source s is
    * emitted ⌊rate_s⌋ full epochs, plus one extra epoch iff its
    * 16-bit md5 bucket falls below the 16-bit-quantized fractional
    * remainder — so undersampled sources keep a hash-fraction of
    * documents (epoch 0 only), oversampled sources repeat whole
    * epochs, and the realized token mass per source lands within
    * n_tokens/65536 of the plan's target.
    *
    * Determinism: rate = target/n is ONE IEEE division (correctly
    * rounded, identical cross-engine); subtracting its integer part
    * and scaling by 2^16 are both exact; the per-document draw is the
    * shared [[graft.functions.Md5Bucket]] rule. Membership of a
    * (doc, epoch) pair depends only on (salt, id, plan row), so a
    * re-run over a grown corpus changes rates but never the draw
    * order — same stability contract as [[hashSplit]].
    *
    * Scale: the plan is one row per source (metadata) and broadcasts;
    * the corpus is touched by the plan's single counting pass plus
    * one projection + explode pass here — no corpus-side shuffle at
    * all. Oversampled output rows are produced by the explode, never
    * by self-union, so a 30-epoch rare domain costs one generator,
    * not 30 plan branches. */
  def executeMixturePlan(df: DataFrame, srcCol: String, idCol: String,
      textCol: String, budgetTokens: Long, salt: String = "epoch")
      : DataFrame = {
    requireFresh(df, "epoch", "__rate", "__ne")
    val plan = mixturePlan(df, srcCol, textCol, budgetTokens)
      .select(col("source").as(srcCol),
        coalesce(col("sample_rate"), lit(0.0)).as("__rate"))
    val bucket = graft.functions.Md5Bucket.bucket(
      salt, col(idCol).cast("string"), 65536)
    val full = floor(col("__rate")).cast("long")
    // exact: rate − ⌊rate⌋ then ·2^16 (power-of-two scale, no rounding)
    val fracQ = floor((col("__rate") - floor(col("__rate"))) * 65536)
      .cast("long")
    df.join(broadcast(plan), Seq(srcCol))
      .withColumn("__ne",
        full + when(bucket < fracQ, 1L).otherwise(0L))
      // sequence(0, -1) would emit a REVERSED range — the filter is
      // load-bearing, not an optimization
      .filter(col("__ne") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__ne") - 1)))
      .select(col(srcCol), col(idCol), col("epoch"))
  }
}

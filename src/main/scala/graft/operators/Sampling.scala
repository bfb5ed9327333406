package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling, splitting, and packing for training-data
  * pipelines. Everything here is a pure function of (id, salt) — no RNG
  * state, no seed-per-partition coupling — so results are identical across
  * runs, cluster sizes, partitionings, AND engines: the hash is md5 (not
  * xxhash64) precisely so an external system (or the DuckDB oracle) can
  * reproduce every assignment from the same SQL.
  *
  * Scale notes: all assignments are per-row map-side expressions (no
  * shuffle); [[packByTokenBudget]] is the one windowed operator and it
  * partitions by an explicit shard key first — a global-order running sum
  * would drag the corpus into ONE partition, the classic
  * window-without-partition scale trap.
  */
object Sampling {

  /** First 8 hex chars of md5(salt || id) — a uniform 32-bit value as
    * fixed-width lowercase hex, so LEXICOGRAPHIC comparison equals numeric
    * comparison and any engine with md5 can reproduce the decision without
    * float arithmetic. */
  /** The split/sample coin: first 8 hex chars of md5(salt || id). Public
    * (and Column-salted) so the SQL surface can register it verbatim
    * (GraftExtensions `split_hash`) and external engines can spell the
    * identical coin — built-in md5/substr end to end, fully codegen'd. */
  def hashHexCol(id: Column, salt: Column): Column =
    substring(md5(concat(salt, id.cast("string"))), 1, 8)

  private def hashHex(id: Column, salt: String): Column =
    hashHexCol(id, lit(salt))

  /** The comparison threshold for `fraction`: floor(fraction * 2^32) as
    * 8-digit hex. Exposed so callers can embed the same literal in
    * external SQL. */
  def fractionThresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1], got $fraction")
    f"${(fraction * 4294967296.0).toLong.min(0xffffffffL)}%08x"
  }

  /** [[fractionThresholdHex]] with an exact keep-everything form: rate 1.0
    * returns a sentinel that compares lexicographically ABOVE every 8-hex
    * digest ('g' > 'f'), so `hash < threshold` keeps all rows — the clamped
    * hex form would drop the one-in-2^32 id whose hash is exactly
    * "ffffffff". Same trick works verbatim in external SQL. */
  def rateThresholdHex(rate: Double): String =
    if (rate >= 1.0) "g" else fractionThresholdHex(rate)

  /** Deterministic train/validation split: `split = "val"` for the
    * `valFraction` of ids whose hash falls below the threshold, `"train"`
    * otherwise. Per-row, shuffle-free, stable under re-runs and data
    * reordering — the properties a reproducible training pipeline needs
    * from its split (a `rand()` split has none of them). Different salts
    * give independent splits (e.g. k-fold via k salts). */
  def deterministicSplit(
      docs: DataFrame,
      valFraction: Double,
      idCol: String = "doc_id",
      salt: String = "graft-split"): DataFrame =
    docs.withColumn("split",
      when(hashHex(col(idCol), salt) < lit(fractionThresholdHex(valFraction)), "val")
        .otherwise("train"))

  /** Deterministic per-stratum sample: keeps `fraction` of each stratum
    * (the hash is salted with the id only, so membership is independent of
    * the stratum column and the kept set is stable as strata are re-labeled).
    * Filter is a per-row predicate — pushes below shuffles/joins placed on
    * top. */
  def stratifiedSample(
      docs: DataFrame,
      fraction: Double,
      idCol: String = "doc_id",
      salt: String = "graft-sample"): DataFrame =
    docs.filter(hashHex(col(idCol), salt) < lit(fractionThresholdHex(fraction)))

  /** Deterministic domain-mixture sampling: keep each row with the rate its
    * category maps to (`rates`, falling back to `defaultRate`) — the
    * re-weighting step that turns raw source/language proportions into a
    * training mixture. The keep decision is `hash(salt, id) < threshold(
    * rate(category))`: per-row, shuffle-free, reproducible across engines,
    * and — because the hash ignores the category — a row's membership at a
    * given rate is stable even when categories are re-labeled (changing only
    * WHICH threshold applies, never the coin flip). Rates above 1.0 are
    * capped at keep-all; upsampling is a union of copies, not a filter. */
  def weightedSample(
      docs: DataFrame,
      categoryCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 1.0,
      idCol: String = "doc_id",
      salt: String = "graft-mix"): DataFrame = {
    val threshold = rates.toSeq.sortBy(_._1).foldLeft(
      lit(rateThresholdHex(defaultRate))) { case (els, (cat, rate)) =>
        when(col(categoryCol) === lit(cat), lit(rateThresholdHex(rate))).otherwise(els)
      }
    docs.filter(hashHex(col(idCol), salt) < threshold)
  }

  /** Weighted sampling WITHOUT replacement, top-k per stratum — the
    * Efraimidis-Spirakis exponential-key scheme (A-ES, IPL 2006): each row
    * draws a deterministic uniform u from its id hash and keys as
    * ln(u)/w (monotone-equivalent to the paper's u^(1/w); higher weight =>
    * key closer to 0 => more likely in the top-k), and the k largest keys
    * per stratum ARE a weighted sample without replacement. One window per
    * stratum, no iteration, no driver state — the distributed form of the
    * sequential reservoir. Keys round to the shared 6-dp grid BEFORE
    * ranking (ln ulp convention), ids break ties; rows with weight <= 0
    * are excluded (standard A-ES domain). Returns the sampled rows with
    * `aes_key` and per-stratum `rank` appended. */
  def weightedReservoir(
      docs: DataFrame,
      weight: Column,
      k: Int,
      strataCols: Seq[String] = Seq.empty,
      idCol: String = "doc_id",
      salt: String = "graft-aes"): DataFrame = {
    require(k > 0, "k must be positive")
    // u = (h60 + 1) / 2^60 in (0, 1]: 60-bit md5 of (id || "|" || salt).
    // Every step is IEEE-identical cross-engine: both engines round the
    // same BIGINT to the same double and divide by the same exact power of
    // two, so u is bit-equal before the ln even runs.
    val h = Sketches.md5Bits60(concat(col(idCol).cast("string"), lit("|" + salt)))
    val u = (h.cast("double") + lit(1.0)) / lit(1152921504606846976.0) // 2^60
    val keyed = docs.filter(weight > 0)
      .withColumn("aes_key", round(log(u) / weight, 6))
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(col("aes_key").desc, col(idCol))
    keyed.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Mixture planning: the per-category keep rates that turn observed
    * category counts into a target mixture with MAXIMUM retention and no
    * upsampling. `K = min over c of n_c / share_c` is the largest total
    * corpus for which every category can still meet its share from the rows
    * it has; `rate_c = K * share_c / n_c` (= 1 for the binding category, < 1
    * elsewhere; 0 for categories absent from `shares`). Feed the result
    * into [[weightedSample]] to execute the plan.
    *
    * Returns one row per category: (category, n, share, rate). The
    * category table is vocabulary-sized, so the global-min cross join is a
    * broadcast of one row against a tiny aggregate — corpus data is touched
    * exactly once, by the count. */
  def mixtureRates(
      docs: DataFrame,
      categoryCol: String,
      shares: Map[String, Double]): DataFrame = {
    require(shares.values.forall(s => s >= 0.0),
      s"shares must be non-negative, got $shares")
    require(shares.values.exists(_ > 0.0), "at least one share must be positive")
    val shareCol = shares.toSeq.sortBy(_._1).foldLeft(lit(0.0)) {
      case (els, (c, s)) => when(col("category") === lit(c), lit(s)).otherwise(els)
    }
    val counts = docs.groupBy(col(categoryCol).as("category"))
      .agg(count(lit(1)).as("n"))
      .withColumn("share", shareCol)
    val k = counts.agg(
      min(when(col("share") > 0, col("n") / col("share"))).as("k_total"))
    counts.crossJoin(broadcast(k))
      .withColumn("rate",
        round(when(col("share") > 0,
          least(lit(1.0), col("k_total") * col("share") / col("n")))
          .otherwise(0.0), 6))
      .select(col("category"), col("n"), col("share"), col("rate"))
  }

  /** End-to-end mixture resampling IN ONE PLAN: [[mixtureRates]]' tiny
    * per-category rate table broadcasts back onto the corpus, each row's
    * keep threshold derived from its category's rate with the same
    * fixed-width-hex comparison as [[weightedSample]] — no driver collect
    * anywhere (the plan's only aggregate is the category count table,
    * vocabulary-sized). Rates at or above 1.0 take the keep-all sentinel
    * BEFORE hex formatting (floor(1.0 · 2³²) is 9 hex digits and would
    * otherwise truncate); categories absent from `shares` carry rate 0 and
    * drop. The corpus is scanned twice (count, then filter) — at 100 TB
    * that's still strictly cheaper than materializing any intermediate,
    * and the second scan's filter is a per-row broadcast-hash probe. */
  def resampleToMixture(
      docs: DataFrame,
      categoryCol: String,
      shares: Map[String, Double],
      idCol: String = "doc_id",
      salt: String = "graft-mix"): DataFrame = {
    // Collision-proof internal names: DataFrame.drop-by-name removes EVERY
    // column with that name, so a caller whose categoryCol is literally
    // "category" would otherwise lose their data column from the result.
    val rates = mixtureRates(docs, categoryCol, shares)
      .select(col("category").as("__mix_category"),
        when(col("rate") >= 1.0, lit("g"))
          .otherwise(lpad(lower(hex(floor(col("rate") * lit(4294967296.0))
            .cast("long"))), 8, "0")).as("__mix_keep_thr"))
    docs.join(broadcast(rates), docs(categoryCol) === rates("__mix_category"))
      .filter(hashHex(col(idCol), salt) < col("__mix_keep_thr"))
      .drop("__mix_category", "__mix_keep_thr")
  }

  /** Deterministic per-category quota: keep at most `k` rows of each
    * category, chosen by hash order — the "cap the dominant domain" step of
    * corpus curation (a threshold sample can't promise an exact per-domain
    * maximum; a quota needs a rank). The rank orders by `hash(salt, id)`
    * with the id as tie-break, so the kept set is a uniform, reproducible
    * choice, stable under input reordering — NOT "first k encountered".
    *
    * Scale note: row_number partitions by category, so the sort is
    * per-category and distributed across them; for a pathological single
    * category holding most of the corpus, pre-filter with
    * [[stratifiedSample]] at a rate that lands near k and cap the
    * remainder. */
  def capPerCategory(
      docs: DataFrame,
      categoryCol: String,
      k: Int,
      idCol: String = "doc_id",
      salt: String = "graft-cap"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy(col(categoryCol))
      .orderBy(hashHex(col(idCol), salt), col(idCol))
    docs.withColumn("cap_rank", row_number().over(w))
      .filter(col("cap_rank") <= k)
      .drop("cap_rank")
  }

  /** Exact-quota proportional stratified sample: per stratum, keep exactly
    * `ceil(count · num/den)` rows, chosen by salted-hash order. The
    * threshold-hash [[stratifiedSample]] keeps `fraction` of each stratum
    * only IN EXPECTATION (binomially distributed per stratum — small strata
    * can land far off); this variant hits the quota exactly, which is what
    * eval-set construction and per-source budget allocation need. The rate
    * is a rational `num/den` so quota arithmetic is pure integer — no
    * float boundary can make two engines disagree by one row.
    *
    * Scale shape: one window over the stratum (rank by hash + stratum size
    * in the same pass) — a single shuffle partitioned by stratum; skewed
    * mega-strata are a window over one key and would shard the salt at
    * extreme scale ([[capPerCategory]] has the same property).
    */
  def exactStratifiedSample(
      docs: DataFrame,
      num: Int,
      den: Int,
      stratumCol: String,
      idCol: String = "doc_id",
      salt: String = "graft-strat"): DataFrame = {
    require(num >= 0 && den > 0 && num <= den, s"need 0 <= num/den <= 1, got $num/$den")
    val w = Window.partitionBy(col(stratumCol))
    val ordered = w.orderBy(hashHex(col(idCol), salt), col(idCol))
    docs
      .withColumn("strat_rank", row_number().over(ordered))
      .withColumn("strat_n", count(lit(1)).over(w))
      // rank <= ceil(n*num/den)  ⟺  rank*den <= n*num + den − 1 (integers)
      .filter(col("strat_rank") * den <= col("strat_n") * num + (den - 1))
      .drop("strat_rank", "strat_n")
  }

  /** Sharded sequence packing: assign each document a (shard, bin) so that
    * consecutive documents (by `idCol` order, within a shard) accumulate
    * into bins of roughly `budget` tokens — the standard pre-tokenization
    * grouping for LLM training batches. `bin = floor(tokens_before / budget)`
    * over the shard-local running sum, so every bin holds at least `budget`
    * tokens once closed EXCEPT via its last document overflowing the
    * boundary (the streaming-friendly approximation; true first-fit packing
    * is an inherently sequential scan and belongs in the tokenizer, not a
    * distributed shuffle).
    *
    * Sharding comes first (`shard = id mod shards`) because a running sum
    * over a global order is a single-partition window — at corpus scale the
    * window MUST be partitioned, and any real packing pipeline shards
    * before packing anyway. Returns the input plus (shard, bin,
    * tokens_before). */
  def packByTokenBudget(
      docs: DataFrame,
      tokensCol: String,
      budget: Long,
      shards: Int = 8,
      idCol: String = "doc_id"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    val shard = pmod(col(idCol), lit(shards.toLong)).as("shard")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    docs.withColumn("shard", shard)
      .withColumn("tokens_before",
        coalesce(sum(col(tokensCol)).over(w) - col(tokensCol), lit(0L)))
      .withColumn("bin", floor(col("tokens_before") / lit(budget.toDouble)).cast("bigint"))
  }

  /** Deterministic multi-epoch shuffle: for each of `epochs` training
    * epochs, every document gets an independent pseudo-random (shard,
    * order_key) — shard from the md5 epoch-key's leading 16 bits mod
    * `shards`, order from the full key. Writing each (epoch, shard)
    * sorted by order_key yields a different stable permutation per epoch
    * with NO global sort: the shard assignment is per-row arithmetic and
    * the per-shard sorts are independent — exactly how a 100 TB corpus is
    * epoch-shuffled in practice (a `rand()` shuffle is neither stable
    * under retries nor reproducible across engines). One output row per
    * (doc, epoch): epochs-fold fan-out, so callers materialize per epoch,
    * not all epochs at once, at full scale. */
  def epochShards(
      docs: DataFrame,
      epochs: Int,
      shards: Int,
      idCol: String = "doc_id",
      salt: String = "graft-epoch"): DataFrame = {
    require(epochs > 0 && shards > 0, s"bad epochs=$epochs shards=$shards")
    val key = md5(concat(lit(salt), lit("-"), col("epoch").cast("string"),
      lit(":"), col(idCol).cast("string")))
    docs.select(col(idCol), explode(sequence(lit(0), lit(epochs - 1))).as("epoch"))
      .withColumn("order_key", key)
      .withColumn("shard",
        (conv(substring(col("order_key"), 1, 4), 16, 10).cast("long")
          % shards).cast("long"))
  }

  // ------------------------------------------------------------------ DSIR

  /** DSIR hashed n-gram features (Xie et al. 2023, Data Selection for
    * Language Models via Importance Resampling): per-document counts of
    * unigrams AND adjacent bigrams hashed into `buckets` buckets — the
    * fixed-dimension bag-of-hashed-ngrams representation both the target
    * and raw bag-of-words models are fit over. The hash is the
    * engine-portable md5 construction ([[Sketches.md5Bits60]] mod B), so
    * an external engine reproduces every bucket assignment.
    *
    * Plan shape: one tokenize feeds both gram orders (the bigram side
    * slices the same split array); the only shuffle is the (id, bucket)
    * partial-aggregated count. Returns (id, bucket, cnt); docs with no
    * tokens are absent (callers left-join, DSIR's empty product = 0). */
  def dsirFeatures(
      docs: DataFrame,
      buckets: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(buckets > 0, s"buckets must be > 0, got $buckets")
    val uni = docs.select(col(idCol).as("id"),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("f"))
      .filter(length(col("f")) > 0)
    // keep must stay re-selectable across adjacentPairs' two projections,
    // so the rename happens here, after the pairing
    val bi = CorpusStats.adjacentPairs(textCol)(docs, Seq(col(idCol)))
      .select(col(idCol).as("id"), concat(col("w1"), lit(" "), col("w2")).as("f"))
    uni.unionByName(bi)
      .select(col("id"), pmod(Sketches.md5Bits60(col("f")), lit(buckets.toLong)).as("bucket"))
      .groupBy(col("id"), col("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** Per-bucket log importance ratios ln p_target(b) - ln p_raw(b), add-one
    * smoothed: lr_b = ln((ct_b+1)/(T_t+B)) - ln((cr_b+1)/(T_r+B)) rounded
    * to 6 dp (one round over the DIFFERENCE absorbs per-ln libm ulps, the
    * q66/q133 convention). Buckets are the union of both sides' observed
    * buckets with zero-coalesced counts — a raw-side bucket the target
    * never emits still gets its smoothed (strongly negative) ratio.
    * Totals join as one-row broadcast scalars. */
  def dsirBucketLogRatios(
      target: DataFrame,
      raw: DataFrame,
      buckets: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val tb = dsirFeatures(target, buckets, idCol, textCol)
      .groupBy(col("bucket")).agg(sum(col("cnt")).as("ct"))
    val rb = dsirFeatures(raw, buckets, idCol, textCol)
      .groupBy(col("bucket")).agg(sum(col("cnt")).as("cr"))
    val joined = tb.join(rb, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
    val tt = tb.agg(sum(col("ct")).as("tt"))
    val tr = rb.agg(sum(col("cr")).as("tr"))
    joined.crossJoin(broadcast(tt)).crossJoin(broadcast(tr))
      .select(col("bucket"),
        round(
          log((col("ct") + 1L).cast("double") / (col("tt") + buckets.toLong)) -
          log((col("cr") + 1L).cast("double") / (col("tr") + buckets.toLong)),
          6).as("lr"))
  }

  /** Per-raw-document DSIR log importance weight: logw_d = Σ_b c_{d,b} ·
    * lr_b — the log-likelihood ratio of the document under the target vs
    * raw hashed-ngram models. Accumulated as DECIMAL of 6-dp-rounded
    * ratios times integer counts (exact, order-independent — the
    * [[CorpusStats.unigramNll]] contract), one double cast at the edge.
    * Every raw document returns a row (featureless docs get the empty
    * product, logw = 0). */
  def dsirWeights(
      raw: DataFrame,
      target: DataFrame,
      buckets: Int = 256,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // NOTE on recompute-vs-cache: the raw corpus featurizes twice (the
    // model aggregate and the per-doc weight join) — deliberately. The
    // pass is a fully-pipelined codegen map (tokenize + md5 + hash-agg);
    // persisting it and checkpointing the weights measured 1.5x SLOWER at
    // sf0.1 (2.98 s vs 2.04 s, A/B at equal floors) because the persist
    // serializes a feature frame larger than the text and the eager
    // barrier blocks whole-stage fusion with the downstream top-k. At
    // 100 TB the same logic holds: recomputing a cheap map pipeline beats
    // materializing a corpus-sized intermediate.
    val lr = dsirBucketLogRatios(target, raw, buckets, idCol, textCol)
    val perDoc = dsirFeatures(raw, buckets, idCol, textCol)
      .join(lr, Seq("bucket"))
      .withColumn("contrib", col("lr").cast("decimal(28,6)") * col("cnt"))
      .groupBy(col("id"))
      .agg(sum(col("contrib")).cast("decimal(38,6)").as("logw"))
    raw.select(col(idCol).as("id")).join(perDoc, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("logw"), lit(0).cast("decimal(38,6)")).as("logw"))
  }

  /** GPT-3-style classifier filtering (Brown et al. 2020, Appendix A) —
    * the discriminative counterpart to [[dsirResample]]'s importance
    * resampling, over the SAME hashed n-gram models: a Naive Bayes
    * target-vs-raw classifier's log-odds for document d is exactly
    * ln(N_t/N_r) + Σ_b c_{d,b}·lr_b = prior + the DSIR log weight (the
    * bag-of-hashed-ngrams likelihood ratio), so the posterior
    * P(target | d) = sigmoid(prior + logw). A document is KEPT when
    * pareto(α) > 1 − posterior — GPT-3's stochastic threshold, which keeps
    * high-scoring docs almost surely but lets a calibrated tail of
    * low-scorers through (distribution coverage). The Pareto draw is the
    * deterministic md5 coin: x = u^(−1/α) − 1, u uniform in (0,1) from
    * md5Bits60(salt:id) — engine-portable, replay-stable.
    *
    * Determinism: the log-odds is DECIMAL (prior rounded 6 dp + the exact
    * DECIMAL logw); posterior and the Pareto draw each take ONE 6-dp round
    * over their ln/exp/pow outputs, and the keep decision compares the two
    * rounded values — reproducible bit-for-bit by the SQL oracle.
    *
    * Returns (idCol, logodds, posterior, pareto_draw, kept) for every raw
    * doc. Scale shape is [[dsirWeights]]'s (vocabulary-keyed aggregates +
    * bucket-keyed join) plus one map-side projection — no new shuffle. */
  def classifierFilter(
      raw: DataFrame,
      target: DataFrame,
      buckets: Int = 256,
      alpha: Double = 9.0,
      idCol: String = "doc_id",
      textCol: String = "text",
      salt: String = "graft-clf"): DataFrame = {
    require(alpha > 0.0, s"alpha must be > 0, got $alpha")
    val nt = target.agg(count(lit(1)).as("nt"))
    val nr = raw.agg(count(lit(1)).as("nr"))
    val u = ((pmod(Sketches.md5Bits60(
        concat(lit(salt), lit(":"), col(idCol).cast("string"))),
        lit(1000000L)) + 1L).cast("double")) / lit(1000001.0)
    val pareto = round(pow(u, lit(-1.0 / alpha)) - 1.0, 6)
    dsirWeights(raw, target, buckets, idCol, textCol)
      .crossJoin(broadcast(nt)).crossJoin(broadcast(nr))
      .withColumn("logodds",
        (round(log(col("nt").cast("double") / col("nr")), 6)
          .cast("decimal(28,6)") + col("logw")).cast("decimal(38,6)"))
      .withColumn("posterior",
        round(lit(1.0) / (lit(1.0) + exp(-col("logodds").cast("double"))), 6))
      .withColumn("pareto_draw", pareto)
      .select(col(idCol),
        col("logodds").cast("double").as("logodds"),
        col("posterior"),
        col("pareto_draw"),
        (col("pareto_draw") > lit(1.0) - col("posterior")).as("kept"))
  }

  /** DSIR selection: Gumbel-top-k importance resampling — k docs from
    * `raw` maximizing logw_d + g_d, where g_d is deterministic Gumbel
    * noise from the md5 coin (g = -ln(-ln u), u uniform from
    * md5Bits60(salt:id) — sampling WITHOUT replacement ∝ exp(logw), the
    * standard Gumbel-top-k identity, reproducible by any engine with md5).
    * The score sums in DECIMAL (both terms 6-dp-rounded) so ranking
    * compares exact values; ties break by id. Returns (rank, id, logw,
    * score) — logw/score cast to double only at the output edge.
    *
    * Scale: weights are two vocabulary-keyed aggregates + one
    * bucket-keyed join; selection is a single top-k over n rows (k rows
    * per partition partial, never a full sort at the sink — Spark lowers
    * orderBy.limit to TakeOrderedAndProject). */
  def dsirResample(
      raw: DataFrame,
      target: DataFrame,
      k: Int,
      buckets: Int = 256,
      idCol: String = "doc_id",
      textCol: String = "text",
      salt: String = "graft-dsir"): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    val u = ((pmod(Sketches.md5Bits60(
        concat(lit(salt), lit(":"), col(idCol).cast("string"))),
        lit(1000000L)) + 1L).cast("double")) / lit(1000001.0)
    val g = round(-log(-log(u)), 6)
    val scored = dsirWeights(raw, target, buckets, idCol, textCol)
      .withColumn("score",
        (col("logw") + g.cast("decimal(28,6)")).cast("decimal(38,6)"))
    scored.orderBy(col("score").desc, col(idCol)).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col(idCol))))
      .select(col("rank").cast("long").as("rank"), col(idCol),
        col("logw").cast("double").as("logw"),
        col("score").cast("double").as("score"))
  }
}

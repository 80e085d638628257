package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-mixture reweighting: given target proportions per source (the
  * "data mixture" every LLM pretraining run specifies — e.g. 50% web,
  * 30% code, 20% books), compute the per-source downsampling fractions
  * that realize the mixture, and apply them.
  *
  * Downsample-only semantics: the achievable corpus size is
  * M = min_s(n_s / p_s) — the scarcest source relative to its target
  * caps the total; every source then keeps frac_s = p_s·M / n_s of its
  * rows. No source is upsampled (duplication is a corpus-quality
  * decision, not a sampling default).
  *
  * Shape at 100 TB: weights come from one per-source count aggregate
  * (bounded by the number of sources) and scalar arithmetic — the fact
  * table is touched once for counting and once for sampling, both
  * map-side. The fractions round-trip through the driver only in
  * [[sample]] (sources-count rows, the same documented tiny-table
  * exception as the IVF centroids).
  */
object Mixture {

  /** Per-source plan: (source, n_rows, target_p, frac, n_keep). Sources
    * absent from `targets` are excluded (weight 0); a TARGETED source
    * absent from the data keeps a row with n_rows = 0 and caps M at 0
    * (the documented min contract: an unobtainable source makes the
    * whole mixture unachievable — it does NOT silently vanish and
    * misreport the remaining sources as the full mixture). All
    * arithmetic is plain IEEE on exact integer counts — deterministic
    * across engines.
    */
  def weights(df: DataFrame, sourceCol: String,
      targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty, "mixture needs at least one target proportion")
    require(targets.values.forall(p => p > 0 && p <= 1),
      s"target proportions must be in (0, 1]: $targets")
    val s = df.sparkSession
    import s.implicits._
    val tgt = targets.toSeq.toDF("__src", "target_p")
    val counts = df.groupBy(col(sourceCol).as("__src"))
      .agg(count(lit(1)).as("n_rows"))
    // left join FROM targets, so every targeted source keeps a row; the
    // broadcast hint goes on the BUILD side of a left join (the right) —
    // a hint on the preserved side is silently unusable
    val joined = tgt.join(broadcast(counts), Seq("__src"), "left")
      .withColumn("n_rows", coalesce(col("n_rows"), lit(0L)))
    val cap = joined.agg(
      min(col("n_rows").cast("double") / col("target_p")).as("__m"))
    joined.crossJoin(broadcast(cap))
      .select(col("__src").as(sourceCol), col("n_rows"), col("target_p"),
        when(col("n_rows") > 0,
          col("target_p") * col("__m") / col("n_rows").cast("double"))
          .otherwise(lit(0.0)).as("frac"),
        floor(col("target_p") * col("__m")).cast("long").as("n_keep"))
  }

  /** The reweighted corpus: Bernoulli-samples each source at its mixture
    * fraction (seeded, per-stratum). Fraction map is sources-count rows —
    * a bounded driver round-trip.
    */
  def sample(df: DataFrame, sourceCol: String, targets: Map[String, Double],
      seed: Long = 42L): DataFrame = {
    val fr = weights(df, sourceCol, targets)
      .select(col(sourceCol), col("frac"))
      .collect()
      .map(r => r.getString(0) -> math.min(1.0, r.getDouble(1))).toMap
    df.stat.sampleBy(sourceCol, fr, seed)
  }

  /** Deterministic size-proportional (PPS) systematic sampling: k stride
    * boundaries laid over the cumulative-weight axis (row order =
    * `orderCol`, which must be total); a row is selected iff a boundary
    * falls inside its weight interval — `floor(cum·k/W) >
    * floor((cum−w)·k/W)` — with multiplicity `n_strides` when a heavy
    * row absorbs several boundaries (Σ n_strides = k). ALL arithmetic is
    * integer (`div` on exact cumulative sums): no RNG, no floats, so the
    * selection is bit-identical across engines, runs and partitionings
    * while inclusion probability stays ∝ weight — the reproducible
    * "sample k docs proportional to length/quality" a curation pipeline
    * wants (the [[hashSplit]] philosophy applied to weighted sampling).
    *
    * Shape at 100 TB: the inclusive running sum is
    * [[GlobalRank.withRunningSum]] (per-chunk cumsum + broadcast chunk
    * offsets — never an unpartitioned window); W is one broadcast
    * one-row aggregate. The table is scanned twice, both map-side.
    * Returns the selected rows with `n_strides` appended.
    */
  def ppsSample(df: DataFrame, orderCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"stride count must be positive: $k")
    val withW = df.withColumn("__w", col(weightCol).cast("long"))
    val cum = GlobalRank.withRunningSum(withW, col(orderCol),
      Seq(col(orderCol)), col("__w"), cumCol = "__cum")
    val total = df.select(col(weightCol).cast("long").as("__tw"))
      .agg(sum(col("__tw")).cast("long").as("__wtotal"))
    cum.crossJoin(broadcast(total))
      .withColumn("__hi", expr(s"(__cum * $k) div __wtotal"))
      .withColumn("__lo", expr(s"((__cum - __w) * $k) div __wtotal"))
      .filter(col("__hi") > col("__lo"))
      .withColumn("n_strides", (col("__hi") - col("__lo")).cast("long"))
      .drop("__w", "__cum", "__wtotal", "__hi", "__lo")
  }

  /** Content-hash train/valid/test split: bucket = md5(id) mod 1000,
    * cut by cumulative per-mille weights. Unlike seeded `randomSplit`,
    * the assignment is a pure function of the row's id — stable across
    * engines, runs, partitionings and row order, which is what a
    * production pipeline needs for a split that must never leak when
    * the corpus is re-processed (and what makes it DuckDB-oracle-able:
    * both engines compute the identical md5 bucket). Weights must sum
    * to ~1; each row lands in exactly one split.
    */
  /** The md5 bucket shared by [[hashSplit]] and [[kfold]]: first 8 hex
    * chars of md5(id) as a 32-bit int, mod `m`. ONE definition — the
    * recipe is an engine contract (DuckDB oracles recompute it), so it
    * must not fork. NOTE: both consumers derive from the SAME 32-bit
    * value, so when k divides 1000, kfold strata are fully correlated
    * with hashSplit buckets (fold = bucket mod k) — by design: the
    * point is reproducibility, not independence. Callers needing
    * independent assignments should salt the id.
    */
  private def md5Bucket(idCol: String, m: Long) = pmod(
    conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long"),
    lit(m))

  /** Seeded deterministic global shuffle + exact-size shard cut — the
    * "shuffle the corpus, then slice it into equal training shards" step
    * a large-scale run performs before packing. The permutation key is
    * md5(seed ":" id), a pure function of (seed, id): any engine, any
    * partitioning, any rerun reproduces the SAME order, and a new seed
    * is a fresh independent shuffle — the property an RNG-seeded
    * `orderBy(rand(seed))` loses the moment the engine's RNG changes.
    * `pos` (1-based permutation position) comes from the two-phase
    * [[GlobalRank]] rank — range-chunked local row_number + broadcast
    * chunk offsets, never a single-task global window — and `shard` is
    * exact NTILE(shards): every shard within one row of n/shards,
    * unlike hash-bucket sharding whose sizes fluctuate binomially.
    */
  def shuffleShard(df: DataFrame, idCol: String, seed: Long, shards: Int,
      chunks: Int = 64): DataFrame = {
    require(shards > 0, s"shard count must be positive: $shards")
    // reserved names: our outputs/temps plus GlobalRank's internals — an
    // input carrying any of them would be silently overwritten-then-
    // dropped rather than failing loudly (ADVICE r13).
    val clash = df.columns.toSet.intersect(
      Set("pos", "shard", "rn", "n_total", "__sk") ++
        GlobalRank.ReservedInternalColumns)
    require(clash.isEmpty, "shuffleShard writes pos/shard (via " +
      s"rn/n_total/__sk and GlobalRank internals); input already has: " +
      clash.toSeq.sorted.mkString(", "))
    // the digest's first 60 bits as a long: numeric so GlobalRank can
    // range-chunk it (percentile cutpoints need a number, not hex text),
    // and exactly re-derivable in any engine from the same md5. concat
    // (not concat_ws) so a NULL id propagates to a NULL key instead of
    // silently hashing as md5(seed) — and a NULL key fails loudly below:
    // the id is the permutation's tie-break, so a deterministic shuffle
    // of NULL-id rows is ill-defined by construction.
    val key0 = conv(substring(
        md5(concat(lit(s"$seed:"), col(idCol).cast("string"))),
        1, 15), 16, 10).cast("long")
    val key = coalesce(key0, assert_true(key0.isNotNull,
      lit(s"shuffleShard: NULL $idCol — the deterministic permutation " +
        "requires non-null ids (they are its tie-break)")).cast("long"))
    GlobalRank.withNtile(df.withColumn("__sk", key),
        col("__sk"), Seq(col("__sk"), col(idCol)),
        k = shards, bucketCol = "shard", chunks = chunks)
      .withColumnRenamed("rn", "pos")
      .drop("__sk", "n_total")
  }

  def hashSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1: $splits")
    val bucket = md5Bucket(idCol, 1000L)
    val cuts = splits.scanLeft(0L) { case (acc, (_, w)) =>
      acc + math.round(w * 1000)
    }.tail
    val expr = splits.map(_._1).zip(cuts).foldRight(lit(splits.last._1)) {
      case ((name, cut), rest) => when(bucket < cut, name).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** Deterministic stratified sampling — the reproducible form of
    * `df.stat.sampleBy` for production pipelines: a row is kept iff its
    * id's md5 bucket (out of 10000) falls below its stratum's basis-point
    * rate, a pure function of (id, stratum). Re-runs, repartitionings and
    * other engines select the SAME rows — no RNG state, so the sample is
    * re-derivable years later from the ids alone (the property seeded
    * sampling loses the moment the engine's RNG changes). Strata not in
    * `ratesBp` default to rate 0. Pure per-row expression — rides the
    * scan as a pushed filter, nothing shuffles.
    */
  def sampleByHash(df: DataFrame, sourceCol: String, idCol: String,
      ratesBp: Map[String, Int]): DataFrame = {
    require(ratesBp.nonEmpty && ratesBp.values.forall(r => r >= 0 && r <= 10000),
      s"rates must be basis points in [0, 10000]: $ratesBp")
    val bucket = md5Bucket(idCol, 10000L)
    val rate = ratesBp.toSeq.sortBy(_._1).foldRight(lit(0)) {
      case ((name, r), rest) => when(col(sourceCol) === name, lit(r)).otherwise(rest)
    }
    df.filter(bucket < rate)
  }

  /** Priority sampling (Duffield, Lund & Thorup, JACM '07) — weighted
    * sampling WITHOUT replacement with a built-in unbiased subset-sum
    * estimator: each row gets priority w/u for u uniform in (0,1], the
    * k highest priorities are kept, and Σ max(w_i, τ) over the kept rows
    * (τ = the (k+1)-th priority) is an unbiased, near-optimal estimator
    * of the total weight of ANY subset — the sketch a sampled corpus
    * needs so downstream token/byte accounting stays calibrated.
    *
    * Derandomized and integer-exact: u = (md5-bucket(id) + 1) ∈
    * [1, 2³²] and priority = ⌊w·2³²/u⌋ in LONG integer division, so the
    * whole draw — including τ and the estimator — is a pure function of
    * the (id, weight) pairs, identical in any engine (DuckDB `//`
    * computes the same floor; q_sample_priority re-derives it all).
    * Ties at the selection boundary break by id.
    *
    * Shape at 100 TB: priorities are a per-row expression riding the
    * scan; top-(k+1) is TakeOrderedAndProject (map-side partial top-k,
    * no global sort, no shuffle of the data); τ is a broadcast 1-row
    * scalar. Weights must be integral and in [1, 2³¹) so w·2³² fits a
    * long (2³¹·2³² = 2⁶³ would overflow) — rows outside that range are
    * EXCLUDED from the draw.
    *
    * Returns the k selected rows as (<idCol>, w, priority,
    * est_w_scaled) where est_w_scaled = max(w·2³², τ) — the DLT
    * estimator contribution SCALED BY 2³² (divide by 2³² for weight
    * units; kept integral so the hash compare is exact).
    */
  /** The shared first stage of every priority-sampling form (global,
    * per-group, streaming): append `w` and the integer-exact `priority`
    * = ⌊w·2³²/md5-u⌋, excluding rows with w outside [1, 2³¹) (the
    * overflow contract). Pure per-row expressions — rides the scan.
    */
  def prioritized(df: DataFrame, idCol: String, weight: Column): DataFrame =
    df.withColumn("w", weight.cast("long"))
      .withColumn("__u", md5Bucket(idCol, 4294967296L) + 1L)
      .filter(col("w") >= 1L && col("w") <= lit((1L << 31) - 1))
      .withColumn("priority", expr("(w * 4294967296L) div __u"))
      .drop("__u")

  def samplePriority(df: DataFrame, idCol: String, weight: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"k >= 1: $k")
    val base = prioritized(df, idCol, weight)
      .select(col(idCol), col("w"), col("priority"))
    val topk1 = base
      .orderBy(col("priority").desc, col(idCol).asc)
      .limit(k + 1)
      .localCheckpoint() // ≤ k+1 rows; pin so tau and sel agree on one draw
    val tau = topk1.agg(
      when(count(lit(1)) === (k + 1), min(col("priority")))
        .otherwise(lit(0L)).as("__tau"))
    topk1
      .orderBy(col("priority").desc, col(idCol).asc)
      .limit(k)
      .crossJoin(broadcast(tau))
      .select(col(idCol), col("w"), col("priority"),
        greatest(col("w") * lit(4294967296L), col("__tau")).as("est_w_scaled"))
  }

  /** Per-group [[samplePriority]] — k rows PER STRATUM with a per-group
    * τ estimator: the weighted sampler a mixture pipeline needs when
    * every source must stay represented (a global draw lets one heavy
    * domain crowd out the rest). Same integer-exact priorities; rank and
    * τ_g come from ONE partitioned window over the group (never an
    * unpartitioned window), and the τ join is keyed by group — every
    * stage shuffles on the stratum only, so 1000 executors each own
    * their strata. Rows with weight outside [1, 2³¹) are EXCLUDED (the
    * integer-overflow contract, same as [[samplePriority]]).
    */
  def samplePriorityByGroup(df: DataFrame, groupCol: String, idCol: String,
      weight: Column, k: Int): DataFrame = {
    require(k >= 1, s"k >= 1: $k")
    import org.apache.spark.sql.expressions.Window
    val base = prioritized(df, idCol, weight)
      .select(col(groupCol), col(idCol), col("w"), col("priority"))
      .withColumn("__rank", row_number().over(Window.partitionBy(groupCol)
        .orderBy(col("priority").desc, col(idCol).asc)))
      .filter(col("__rank") <= k + 1)
    val tau = base.groupBy(groupCol).agg(
      coalesce(min(when(col("__rank") === (k + 1), col("priority"))),
        lit(0L)).as("__tau"))
    base.filter(col("__rank") <= k)
      .join(tau, groupCol)
      .select(col(groupCol), col(idCol), col("w"), col("priority"),
        greatest(col("w") * lit(4294967296L), col("__tau")).as("est_w_scaled"))
  }

  /** Deterministic k-fold assignment — [[hashSplit]]'s cross-validation
    * counterpart: fold = md5-bucket(id) mod k, a pure function of the
    * row's id. Re-processing the corpus, changing partitioning, or
    * running in another engine reproduces the exact folds, so no
    * example ever migrates between train and held-out across runs (the
    * leak that invalidates a CV estimate). Pure per-row expression —
    * rides the scan, nothing shuffles.
    */
  def kfold(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k-fold needs k >= 2, got $k")
    df.withColumn("fold", md5Bucket(idCol, k.toLong))
  }

  /** Temperature-scaled mixture rates — the α=1/2 flattening of source
    * shares (p_s ∝ n_s^α, the multilingual/multi-source sampling recipe
    * of mBERT/XLM-R: big sources damped, scarce sources boosted).
    * Realized by DOWNSAMPLING: the scarcest source is kept whole and
    * source s keeps rate r_s = √(n_min/n_s), so realized shares ∝ √n_s.
    * α is fixed at 1/2 because IEEE `sqrt` is exactly rounded in every
    * engine while `pow(x, α)` is not — the rate table
    * `(w_min·10000) div w_s` over `w = floor(√n · 1e6)` is therefore a
    * bit-identical integer function of the counts alone, anywhere.
    * Output: (source, n_rows, w_micro, rate_bp), one row per source.
    */
  def temperatureRates(df: DataFrame, sourceCol: String): DataFrame = {
    val counts = df.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_rows"))
    val w = counts.withColumn("w_micro",
      floor(sqrt(col("n_rows").cast("double")) * lit(1e6)).cast("long"))
    val wmin = w.agg(min("w_micro").as("__wmin"))
    w.crossJoin(broadcast(wmin))
      .select(col("source"), col("n_rows"), col("w_micro"),
        expr("(__wmin * 10000) div w_micro").cast("long").as("rate_bp"))
  }

  /** [[temperatureRates]] applied: md5-deterministic per-source sampling
    * ([[sampleByHash]]'s keep rule with data-derived rates) plus the
    * per-source realization report (n_sampled + id-sum membership
    * digest). Two scans — one count histogram, one broadcast-rate
    * map-side filter — and a sources-bounded aggregate; nothing else
    * shuffles. Which rows are kept is a pure function of (id, counts),
    * so re-runs and other engines select identical rows.
    */
  def temperatureSampleReport(df: DataFrame, sourceCol: String,
      idCol: String): DataFrame = {
    val rates = temperatureRates(df, sourceCol)
    val kept = df
      .select(col(sourceCol).as("source"), col(idCol).cast("long").as("__id"))
      .join(broadcast(rates.select(col("source"), col("rate_bp"))), "source")
      .filter(md5Bucket("__id", 10000L) < col("rate_bp"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_sampled"), sum("__id").as("sum_ids"))
    rates.join(kept, Seq("source"), "left")
      .select(col("source"), col("n_rows"), col("w_micro"), col("rate_bp"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
        coalesce(col("sum_ids"), lit(0L)).as("sum_ids"))
  }

  /** Per-source REPEAT factors realizing a target mixture at constant
    * corpus size — the upsampling complement of [[weights]] (which only
    * downsamples). factor_s = target_s · N / n_s in integer micro-units
    * via exact integer division: `(t_micro_s · N) div n_s`, so the
    * factor table is bit-identical in any engine (no IEEE division).
    * Overflow bound: t_micro ≤ 1e6 and the product must fit a long, so
    * N ≤ ~9.2e12 rows — beyond any real corpus (100 TB of 2 KB docs is
    * 5e10 rows); asserted at runtime. Sources absent from `targetsMicro`
    * get factor 0 (excluded — same contract as [[weights]]); a targeted
    * source absent from the data yields no row (nothing to repeat).
    * Output: (sourceCol, n_rows, factor_micro), bounded by the number
    * of sources.
    */
  def repeatFactors(df: DataFrame, sourceCol: String,
      targetsMicro: Map[String, Long]): DataFrame = {
    require(targetsMicro.nonEmpty &&
      targetsMicro.values.forall(t => t >= 0 && t <= 1000000L),
      s"target shares must be micro-units in [0, 1e6]: $targetsMicro")
    val s = df.sparkSession
    import s.implicits._
    val tgt = targetsMicro.toSeq.toDF("__src", "__t_micro")
    val counts = df.groupBy(col(sourceCol).as("__src"))
      .agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(coalesce(sum(col("n_rows")), lit(0L)).as("__n"))
    counts.join(broadcast(tgt), Seq("__src"), "inner")
      .crossJoin(broadcast(total))
      .select(col("__src").as(sourceCol), col("n_rows"),
        // the guard lives INSIDE the output column so pruning can't
        // elide it: factors are only produced when t_micro·N fits a long
        when(col("__n") > lit(9223372036854L),
          raise_error(lit("repeatFactors: corpus too large for long micro arithmetic")))
          .otherwise(expr("(__t_micro * __n) div n_rows"))
          .cast("long").as("factor_micro"))
  }

  /** Deterministic fractional upsampling by per-source repeat factors
    * (the "epochs per domain" step of a mixture with scarce domains —
    * e.g. 3.2 epochs of books against 1 epoch of web). Each row is
    * emitted `factor div 1e6` times, plus one extra copy iff its id's
    * md5 bucket (out of 1e6) falls below `factor mod 1e6` — so the
    * realized count is within one row of exact per stratum, and WHICH
    * rows carry the extra epoch is a pure function of the id
    * ([[sampleByHash]]'s determinism applied to duplication). Output
    * appends `copy` (1-based epoch index) so downstream shuffles/sorts
    * treat copies as distinct rows. Per-row explode of a bounded
    * sequence — no shuffle; rows from sources absent in `factorsMicro`
    * are dropped (factor 0).
    *
    * Shape at 100 TB: output size = Σ n_s·f_s by construction; the
    * explode multiplies rows AFTER any pushed filters, and a factor
    * table is `sources` rows however it was derived ([[repeatFactors]]
    * or hand-set).
    */
  def upsampleByFactor(df: DataFrame, sourceCol: String, idCol: String,
      factorsMicro: Map[String, Long]): DataFrame = {
    require(factorsMicro.nonEmpty &&
      factorsMicro.values.forall(f => f >= 0 && f <= 1000L * 1000000L),
      s"repeat factors must be micro-units in [0, 1000·1e6]: $factorsMicro")
    val factor = factorsMicro.toSeq.sortBy(_._1).foldRight(lit(0L)) {
      case ((name, f), rest) =>
        when(col(sourceCol) === name, lit(f)).otherwise(rest)
    }
    val extra = when(md5Bucket(idCol, 1000000L) < factor % lit(1000000L),
      lit(1L)).otherwise(lit(0L))
    // whole epochs via exact integer arithmetic: (f − f mod 1e6) / 1e6
    // stays in longs (no IEEE division anywhere in the copy count)
    val base = (factor - factor % lit(1000000L)) / lit(1000000L)
    df.withColumn("__n_copies", (base.cast("long") + extra).cast("int"))
      .withColumn("copy",
        explode(when(col("__n_copies") >= 1,
          sequence(lit(1), col("__n_copies"))).otherwise(array().cast("array<int>"))))
      .drop("__n_copies")
  }
}

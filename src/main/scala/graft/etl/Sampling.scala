package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, key-stable sampling and splitting — the reproducible
  * alternative to rand()-based sampling for training-data pipelines:
  * membership depends only on the KEY, so re-runs, backfills, and
  * incremental loads route the same document to the same split, on any
  * cluster, at any parallelism.
  *
  * Mechanism: bucket = hash(key, salt) mod denominator. No shuffle,
  * no state — a pure filter expression the scan can evaluate. Two hash
  * flavors:
  *  - default: xxhash64 (Spark-native, codegen'd, fastest);
  *  - portable: md5-prefix → integer, reproducible in ANY engine with
  *    md5 (DuckDB, Postgres, Trino, …) — use when split membership must
  *    be auditable outside Spark (e.g. a held-out set shared across
  *    teams and engines).
  */
object Sampling {

  private def bucket(key: Column, salt: String, denom: Int,
                     portable: Boolean): Column =
    if (portable)
      // first 15 hex digits of md5(salt || key) = 60 bits, exact in a
      // signed long; any engine computes the same value from the same
      // string key
      pmod(conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 15),
        16, 10).cast("long"), lit(denom.toLong))
    else
      pmod(xxhash64(lit(salt), key), lit(denom.toLong))

  /** Keep ~numerator/denominator of rows, keyed. */
  def hashSample(df: DataFrame, key: String, numerator: Int, denominator: Int,
                 salt: String = "graft", portable: Boolean = false): DataFrame = {
    require(numerator >= 0 && numerator <= denominator && denominator > 0)
    df.filter(bucket(col(key), salt, denominator, portable) < numerator)
  }

  /** Stratified hash sample: per-stratum keep rates (permille), for
    * corpus rebalancing (e.g. downsample the dominant language, keep
    * the rest). The stratum value participates in the hash, so strata
    * sample independently even for identical keys; membership stays
    * key-stable and engine-portable (with portable=true, any
    * md5-capable engine reproduces it). Strata not in the map keep
    * `defaultPermille`. */
  def stratifiedSample(df: DataFrame, key: String, strataCol: String,
                       permilleByStratum: Map[String, Int],
                       defaultPermille: Int = 1000,
                       salt: String = "graft",
                       portable: Boolean = false): DataFrame = {
    require((permilleByStratum.values ++ Seq(defaultPermille))
      .forall(p => p >= 0 && p <= 1000))
    val rate = permilleByStratum.foldLeft(lit(defaultPermille)) {
      case (acc, (stratum, p)) => when(col(strataCol) === stratum, lit(p)).otherwise(acc)
    }
    val strataKey = concat(col(strataCol).cast("string"), col(key).cast("string"))
    df.filter(bucket(strataKey, salt, 1000, portable) < rate)
  }

  /** Resample to a TARGET MIXTURE: given per-stratum target shares
    * (e.g. en→0.5, zh→0.2, …), keep the LARGEST deterministic subset
    * whose composition matches the shares. Per-stratum keep rates are
    * computed IN-PLAN from the data: stratum counts → the binding
    * stratum (smallest count/share, kept whole) → every other stratum
    * downsampled to match — so the same call serves any corpus without
    * a hand-tuned rate table, and the whole thing stays one lazy plan
    * (tiny count aggregate, broadcast back; no driver-side count()).
    * Membership is the portable md5 bucket over stratum||key — stable
    * across re-runs, engines, and parallelism. Strata absent from
    * `targetShare` are dropped (a mixture is a whitelist). */
  def mixtureResample(df: DataFrame, key: String, strataCol: String,
                      targetShare: Map[String, Double],
                      salt: String = "graft"): DataFrame = {
    require(targetShare.nonEmpty && targetShare.values.forall(_ > 0))
    val share = targetShare.foldLeft(lit(null).cast("double")) {
      case (acc, (stratum, p)) =>
        when(col(strataCol) === stratum, lit(p)).otherwise(acc)
    }
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__w", share).filter(col("__w").isNotNull)
    val binding = counts.agg(
      min(col("__n").cast("double") / col("__w")).as("__m"))
    // rate_s = m·w_s/n_s ≤ 1 by construction of m; compare in integer
    // bucket space (floor to a permillion threshold) so both engines
    // evaluate the identical predicate. The binding stratum (n/w == m,
    // bit-identical doubles — same computation on both sides) is pinned
    // to exactly 1_000_000: floor((n/w)·w/n·1e6) can land at 999_999 in
    // IEEE doubles, which would drop ~1-per-million binding-stratum rows.
    val rates = counts.crossJoin(broadcast(binding)).select(col(strataCol),
      when(col("__n").cast("double") / col("__w") === col("__m"), lit(1000000L))
        .otherwise(floor(col("__m") * col("__w") / col("__n").cast("double") * lit(1000000)))
        .as("__thr"))
    df.join(broadcast(rates), strataCol)
      .filter(bucket(concat(col(strataCol).cast("string"), col(key).cast("string")),
        salt, 1000000, portable = true) < col("__thr"))
      .drop("__thr")
  }

  /** Keep the top `frac` of rows per stratum by `scoreCol` (desc;
    * `tiebreakCol` makes the order total so membership is exact and
    * deterministic) — rank-based quality filtering, the percentile
    * cousin of a fixed score threshold: composition-robust when score
    * distributions drift between strata or snapshots. Uses one
    * cume_dist window PER STRATUM, the right shape when strata are
    * numerous and individually bounded (lang × source). For a handful
    * of giant strata, swap in an approximate-quantile threshold
    * (aggregate → broadcast → filter) instead of ranking every row. */
  def topFractionByStratum(df: DataFrame, strataCols: Seq[String],
                           scoreCol: String, tiebreakCol: String,
                           frac: Double): DataFrame = {
    require(frac > 0 && frac <= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy(col(scoreCol).desc, col(tiebreakCol).asc)
    df.withColumn("__cd", cume_dist().over(w))
      .filter(col("__cd") <= frac).drop("__cd")
  }

  /** The GIANT-STRATA variant of [[topFractionByStratum]]: per-stratum
    * score threshold from a percentile sketch (one aggregate), broadcast
    * back, plain filter — NO per-row window anywhere, so no stratum ever
    * ranks all its rows on one reducer. The trade: membership is
    * "score ≥ threshold" (ties at the threshold all survive; kept share
    * tracks `frac` within the sketch guarantee) instead of the exact
    * floor(frac·n) rank cut. At `accuracy` ≥ stratum size the sketch
    * holds every value and the threshold is the exact discrete
    * (1−frac)-quantile element — which is what lets qf02 replay it
    * cross-engine. Scores are rounded to 6dp BEFORE the sketch so both
    * engines pick the threshold element from identical doubles.
    *
    * That exactness guarantee silently lapses once any stratum outgrows
    * `accuracy`, so the oracle-gated path sets `requireExact = true`:
    * the stratum count rides along in the SAME aggregate (no extra
    * pass) and a `raise_error` fires in-plan if any stratum exceeds
    * `accuracy` — the job fails loudly instead of drifting from the
    * cross-engine oracle. Leave it false for production use at scale,
    * where "within the sketch guarantee" is the documented contract. */
  def approxTopFractionByStratum(df: DataFrame, strataCols: Seq[String],
                                 scoreCol: String, frac: Double,
                                 accuracy: Int = 1000000,
                                 requireExact: Boolean = false): DataFrame = {
    require(frac > 0 && frac <= 1)
    val scored = df.withColumn("__score_r", round(col(scoreCol), 6))
    val agg = scored.groupBy(strataCols.map(col): _*)
      .agg(percentile_approx(col("__score_r"), lit(1 - frac), lit(accuracy))
        .as("__thr"), count(lit(1)).as("__n"))
    val thresholds =
      if (requireExact)
        agg.select(strataCols.map(col) :+
          when(col("__n") > accuracy, raise_error(concat(
            lit("approxTopFractionByStratum(requireExact=true): a stratum of "),
            col("__n"),
            lit(s" rows exceeds accuracy=$accuracy; the threshold would be " +
              "approximate, not the exact discrete quantile"))))
            .otherwise(col("__thr")).as("__thr"): _*)
      else agg.drop("__n")
    scored.join(broadcast(thresholds), strataCols)
      .filter(col("__score_r") >= col("__thr"))
      .drop("__score_r", "__thr")
  }

  /** Systematic PPS (probability-proportional-to-size) sampling: pick
    * `k` rows per stratum with inclusion probability proportional to
    * `weightCol` — the classic weighted sampler for training-data
    * mixtures ("sample documents proportional to token count"), in its
    * fully DETERMINISTIC, integer-exact form (no rand(), no
    * transcendentals — replayable bit-for-bit in any engine).
    *
    * Mechanism (one pass, no rejection): lay the strata's rows on a
    * line in `orderCol` order, each covering an interval of length =
    * its weight; shoot k evenly-spaced darts t_j = ⌊(2j+1)·W / 2k⌋
    * (j = 0..k−1, W = stratum weight sum); a row is selected iff a
    * dart lands in its interval. Exactly k selections per stratum when
    * W ≥ k (darts are distinct); a row wider than the W/k stride can
    * catch several darts but is emitted once. Zero-weight rows are
    * never selected (empty interval); an all-zero stratum selects
    * nothing (guarded — no division by zero).
    *
    * Dart-count-below-x closes over integer floor division:
    * cnt(x) = clamp(⌈(2kx − W) / 2W⌉, 0, k), so selection is
    * cnt(hi) − cnt(lo) > 0 with hi/lo the cumulative-weight interval —
    * the clamp makes trunc-vs-floor division agree for every sign, so
    * Spark `div` and DuckDB `//` compute identical picks.
    *
    * Scale shape: two windows per stratum (running sum + stratum
    * total), both partitioned by the strata columns — bounded strata,
    * the qf01 pattern; no global window, no shuffle beyond the
    * stratum hash. For ONE giant stratum, pre-aggregate per-partition
    * weight offsets (the OrderedShuffle prefix-sum trick) instead. */
  def systematicPps(df: DataFrame, strataCols: Seq[String], weightCol: String,
                    orderCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val byStratum = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
    val running = byStratum.orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val w = col(weightCol).cast("bigint")
    // `div` (integral division) keeps everything in exact bigint space;
    // nullif guards the all-zero-weight stratum (null cnt → row dropped)
    def cnt(x: String): Column = expr(
      s"least(CAST($k AS BIGINT), greatest(CAST(0 AS BIGINT), " +
        s"(${2L * k} * $x + __w - 1) div nullif(2 * __w, 0)))")
    df.withColumn("__hi", sum(w).over(running))
      .withColumn("__w", sum(w).over(byStratum))
      .withColumn("__lo", col("__hi") - w)
      .filter(cnt("__hi") > cnt("__lo"))
      .drop("__hi", "__lo", "__w")
  }

  /** Tag each row train/test with a ~testPermille/1000 test share.
    * Complementary by construction: every key lands in exactly one split. */
  def trainTestSplit(df: DataFrame, key: String, testPermille: Int,
                     salt: String = "graft", portable: Boolean = false): DataFrame = {
    require(testPermille >= 0 && testPermille <= 1000)
    df.withColumn("split",
      when(bucket(col(key), salt, 1000, portable) < testPermille, lit("test"))
        .otherwise(lit("train")))
  }

  /** Deterministic k-FOLD assignment: `fold` = key bucket in [0, k).
    * Every row lands in exactly one fold, folds are disjoint and
    * jointly exhaustive by construction, and membership is key-stable —
    * cross-validation folds that survive re-runs and backfills without
    * materializing k corpus copies. Same hash flavors as the other
    * samplers (portable=true ⇒ md5, reproducible in any engine). */
  def kFold(df: DataFrame, key: String, k: Int, salt: String = "graft",
            portable: Boolean = false): DataFrame = {
    require(k > 0)
    df.withColumn("fold", bucket(col(key), salt, k, portable))
  }
}

package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query and total
  * wall-clock seconds.
  *
  * Methodology:
  *  - Results go to the `noop` sink, not `.count()` — count() lets
  *    Catalyst prune projection expressions, so expression-heavy queries
  *    (scoring, hashing, similarity) would report scan time instead of
  *    compute time. noop materializes every output column.
  *  - A warmup pass at the SAME scale factor runs each query once so the
  *    timed numbers measure the engine, not Janino codegen + JIT
  *    compilation of each query's generated code (one-time costs that
  *    amortize to zero on a real cluster run). Warmup must use the same
  *    SF because AQE re-plans by runtime stats — a smaller SF compiles
  *    different physical stages. Set SPARK_GRAFT_WARMUP=0 for cold runs.
  *  - All persisted/cached data is dropped between warmup and the timed
  *    pass: queries that build internal indexes (LSH signatures, IVF
  *    cells) register them with the CacheManager, and an identical
  *    logical plan in the timed pass would silently reuse them — the
  *    timed pass must recompute every stage.
  *  - Queries run in sorted-name order for run-to-run comparability.
  *  - The timed pass runs SPARK_GRAFT_ITERS times (default 2) with the
  *    cache cleared between iterations, and each query reports its
  *    MINIMUM. Single-shot timings are hostage to one GC pause or a
  *    transient machine-load spike (observed: the same unchanged
  *    aggregate query measuring 1.0 s and 14.1 s across runs); the
  *    per-iteration cache clear means every iteration still recomputes
  *    every stage, so the min is a legitimate steady-state measure, not
  *    a cache artifact.
  */
object Bench {
  /** The 11 deliberately-exhaustive audit/truth probes (the r11 list,
    * SCALE.md §Round 11): brute-force ANN truth sides, exact-kernel
    * audit tools, and output-bound pair queries — Θ(corpus × probes)
    * or Θ(Σ cluster²) BY DEFINITION, kept in the suite as recall/truth
    * oracles for the sublinear production substitutes. They cost ~47%
    * of sf10 wall-clock (r14), so decade runs may skip them
    * (SPARK_GRAFT_SKIP_PROBES=1) without losing the audit signal —
    * every line records the production/probe split either way, and
    * the history `skip_probes` flag keeps lines comparable. */
  val probeQueries: Set[String] = Set(
    "nn01_cosine_topk", "nn03_embedding_neardup", "nn05_lsh_recall",
    "nn06_ivf_allprobe", "nn09_adc_recall", "fz02_prefix_jaccard",
    "sd01_semantic_dedup", "dd06_dup_clusters", "bj01_band_join",
    "dd13_best_of_cluster", "sm04_leakage_safe_split")

  /** HOST-MODE CALIBRATION (VERDICT r15 #2): the host is measurably
    * bimodal (NOTES_r9; NOTES_r15 refined it — CPU-dense kernels drift
    * 1.6–2× in the slow ambient mode while scan/shuffle drifts only
    * 1.1–1.2×, with no competing process and nominal clocks), and three
    * rounds have now spent triage hours deciding by hand whether a
    * suite total moved because of code or because of the host. This
    * runs two fixed DATA-INDEPENDENT probes before any recorded pass —
    * one compute-dense (md5 + base-conv over a range: string alloc +
    * hash loop, the kernel class that drifts hardest), one
    * shuffle-dense (range → 1M-key groupBy → count) — and stamps their
    * min-of-2 seconds into the history line together with the ratio vs
    * the best calibration EVER RECORDED on this host
    * (bench/calib_history.jsonl, append-only). Classification is
    * self-calibrating: the best-known line defines fast mode, so the
    * stamp needs no a-priori constants and tightens as fast-mode
    * sessions append. Rule of thumb from the r15 retakes: cpu_vs_best
    * ≳ 1.35 is the slow ambient mode; don't chase per-query
    * regressions on such a line. (This comment describes the system;
    * `calibrate` below times the kernels, `calibMode` labels the
    * reading.)
    *
    * Host-mode label for a calibration reading. `cpuR` = this line's
    * cpu_s vs the config's best-ever; `spread` = the config's history
    * max/min cpu_s INCLUDING this line. Thresholds from the r15 triage
    * rule: compute-dense kernels drift >=1.35x in the slow ambient
    * mode (observed 1.6-2x at the converged retakes), <=1.2x is
    * within fast-mode noise. The cold-start rule (added r16 after the
    * session-first read stamped a slow line "fast"): until the history
    * at this local[N] has actually spanned both modes (spread >=
    * 1.35), being near best-ever only proves consistency with every
    * prior line — which may ALL be slow — so the label is
    * "near-best-unconfirmed", not "fast". The first genuinely fast
    * session lowers best by >=1.35x, the spread gate opens, and every
    * later line classifies absolutely. */
  def calibMode(cpuR: Double, spread: Double, uncalibrated: Boolean): String =
    if (uncalibrated) "uncalibrated"
    else if (cpuR >= 1.35) "slow"
    else if (cpuR <= 1.2) { if (spread >= 1.35) "fast" else "near-best-unconfirmed" }
    else "mid"

  def calibrate(spark: SparkSession): (Double, Double) = {
    import org.apache.spark.sql.functions._
    def timeMin(mk: => Unit): Double = {
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        mk
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      best
    }
    def cpuJob(n: Long): Unit = spark.range(0, n, 1, 32)
      .select(sum(conv(substring(md5(col("id").cast("string")), 1, 15), 16, 10)
        .cast("decimal(38,0)")).as("s"))
      .head()
    def shuffleJob(n: Long): Unit = spark.range(0, n, 1, 32)
      .groupBy(pmod(col("id") * 2654435761L, lit(1000000L)).as("k"))
      .agg(count(lit(1)).as("c"))
      .agg(sum(col("c")), count(lit(1))).head()
    cpuJob(1000000L); shuffleJob(1000000L) // codegen/JIT warmup, untimed
    (timeMin(cpuJob(8000000L)), timeMin(shuffleJob(30000000L)))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val warmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0"
    val skipProbes = sys.env.getOrElse("SPARK_GRAFT_SKIP_PROBES", "0") == "1"
    // SPARK_GRAFT_CONCURRENT=N (N>=2) → timed passes submit all queries
    // to an N-thread pool, one FAIR scheduler pool per query, and the
    // recorded value is the BATCH WALL-CLOCK (VERDICT r15 #3: ~0.4 s of
    // per-query job setup × 190 queries is half the sequential sf0.1
    // total — the scheduler floor amortizes when submission overlaps).
    // Sequential mode (driver default) is untouched; concurrent lines
    // carry "concurrent":N so tooling never mixes the two populations.
    val concurrent = sys.env.get("SPARK_GRAFT_CONCURRENT")
      .map(_.trim.toInt).filter(_ >= 2)
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val spark = concurrent.fold(builder0)(_ =>
      // FAIR across per-query pools; pools materialize on demand with
      // weight 1 / minShare 0, so no allocation file is needed. Only
      // set in concurrent mode — sequential lines stay bit-comparable
      // with the r8+ history.
      builder0.config("spark.scheduler.mode", "FAIR"))
      // A full-suite decade run keeps one JVM alive for hours across
      // ~550 query executions, and broadcast/shuffle state is only
      // reclaimed when the DRIVER GCs the referencing objects — with a
      // large quiet heap that can lag by many queries. The default
      // 30min periodic-GC cadence let execution memory starve late in
      // the r11 sf10 run (nn11 pass2 OOM'd in a sorter after 2.7 h and
      // ~460 executions, having passed warmup and pass1 at identical
      // sizes). 5min keeps the ContextCleaner fed without touching any
      // timed region (the GC runs on the cleaner's own thread).
      .config("spark.cleaner.periodicGC.interval", "5min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Host-mode stamp, taken BEFORE warmup so it reads the same ambient
    // state the recorded passes will run under. SPARK_GRAFT_CALIB=0
    // skips it (sub-minute targeted runs where 10 s of probe dominates).
    val calibJson =
      if (sys.env.getOrElse("SPARK_GRAFT_CALIB", "1") == "0") ""
      else {
        val (cpuS, shufS) = calibrate(spark)
        val histPath = java.nio.file.Paths.get("bench/calib_history.jsonl")
        // best-ever is only meaningful within one local[N] config: the
        // kernels use fixed work sizes, so a local[4] line would read
        // as "4x slow mode" against a local[32] best
        def priorVals(key: String): Seq[Double] =
          if (!java.nio.file.Files.exists(histPath)) Seq.empty
          else {
            val re = (s""""$key":([0-9.]+)""").r
            scala.jdk.CollectionConverters
              .ListHasAsScala(java.nio.file.Files.readAllLines(histPath)).asScala
              .filter(_.contains(s""""cpus":$cpus"""))
              .flatMap(l => re.findFirstMatchIn(l).map(_.group(1).toDouble))
              .toSeq
          }
        def priorBest(key: String): Option[Double] = {
          val vs = priorVals(key); if (vs.isEmpty) None else Some(vs.min)
        }
        def priorWorst(key: String): Option[Double] = {
          val vs = priorVals(key); if (vs.isEmpty) None else Some(vs.max)
        }
        val cpuBest = priorBest("cpu_s").fold(cpuS)(math.min(_, cpuS))
        val shufBest = priorBest("shuffle_s").fold(shufS)(math.min(_, shufS))
        val uncalibrated = priorBest("cpu_s").isEmpty
        val cpuR = cpuS / cpuBest
        val shufR = shufS / shufBest
        // Spread of the config's full calib history (incl. this line):
        // max/min cpu_s. Until the history has SEEN both host modes at
        // this local[N] (spread >= the 1.35x slow threshold), "near
        // best-ever" is not evidence of fast mode — the best-ever line
        // may itself be a slow-mode reading. The r16 session-first read
        // demonstrated the failure: cpu 4.15 s vs a best of 3.54 s
        // (both slow; fast is ~2.4-2.7 s extrapolating the 1.6-2x
        // kernel drift) stamped "fast" at 1.17x. So:
        val cpuWorst = priorWorst("cpu_s").fold(cpuS)(math.max(_, cpuS))
        val spread = cpuWorst / cpuBest
        val mode = Bench.calibMode(cpuR, spread, uncalibrated)
        val line = f"""{"cpu_s":$cpuS%.3f,"shuffle_s":$shufS%.3f,"cpus":$cpus,"ts":"${java.time.Instant.now()}"}"""
        try {
          java.nio.file.Files.createDirectories(histPath.getParent)
          java.nio.file.Files.writeString(histPath, line + "\n",
            java.nio.file.StandardOpenOption.CREATE,
            java.nio.file.StandardOpenOption.APPEND)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] calib history append failed: ${e.getMessage}")
        }
        System.err.println(
          f"[bench] calib cpu=$cpuS%.2fs (${cpuR}%.2fx best) shuffle=$shufS%.2fs (${shufR}%.2fx best) mode=$mode")
        f""","cpus":$cpus,"calib":{"cpu_s":$cpuS%.3f,"shuffle_s":$shufS%.3f,"cpu_vs_best":$cpuR%.2f,"shuffle_vs_best":$shufR%.2f,"mode":"$mode"}"""
      }

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
            dir: String): Unit =
      fn(spark, dir).write.format("noop").mode("overwrite").save()

    // SPARK_GRAFT_BENCH_ONLY=nn08,mm,ix01 → bench only matching-prefix
    // queries (same convention as Verify's SPARK_GRAFT_ONLY). Driver
    // leaves it unset and benches everything; subset runs are for
    // targeted scale decades (e.g. heavy families at sf10, where a
    // full 188-query pass would take hours). Budget checks are skipped
    // for subset runs — a partially-selected family's subtotal would
    // trip its band spuriously.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    // Corpus fingerprint (relative path + size of every file under
    // sfDir, sorted, md5'd): scale corpora are rebuilt artifacts shared
    // across rounds, and two history lines are only comparable if they
    // ran the SAME corpus build — the id makes a silent rebuild (or an
    // accidental write-through by a query, checked again after the
    // timed passes) detectable from the history line alone.
    def corpusFingerprint(dir: String): (String, Long, Long) = {
      val root = java.nio.file.Paths.get(dir)
      val files = {
        val s = java.nio.file.Files.walk(root)
        try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator())
          .asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(p => root.relativize(p).toString -> java.nio.file.Files.size(p))
          .toSeq.sortBy(_._1)
        finally s.close()
      }
      val md = java.security.MessageDigest.getInstance("MD5")
      files.foreach { case (p, sz) => md.update(s"$p:$sz\n".getBytes("UTF-8")) }
      (md.digest().take(4).map("%02x".format(_)).mkString,
        files.size.toLong, files.map(_._2).sum)
    }
    val (corpusId, corpusFiles, corpusBytes) = corpusFingerprint(sfDir)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .filter { case (name, _) => !(skipProbes && probeQueries.contains(name)) }
    // Per-query progress lines to stderr in EVERY pass (incl. warmup):
    // a query that hangs or dies at a big SF must be identifiable from
    // the live log, not reconstructed from stage numbers after the
    // fact (an sf10 warmup query once ran 58 min and died on a spilled
    // sort with nothing in the log naming it).
    def progress(tag: String, name: String, secs: Double, ok: Boolean): Unit =
      System.err.println(f"[bench] $tag $name ${secs}%.1f s${if (ok) "" else " FAILED"}")
    // Any pass that throws tees the exception CLASS + full stack to a
    // file under bench/logs/, named in the live log and (for timed
    // passes) referenced from the history line. The r14 mm04 transient
    // lost its exception class because a manually-launched run's
    // stderr went to an uncaptured console (VERDICT r14 #4); failures
    // are rare enough that the next 1-in-10 one must be diagnosable
    // from the record alone.
    val runStamp = java.time.Instant.now().toString.replaceAll("[:.]", "-")
    def logFailure(tag: String, name: String, e: Throwable): String = {
      val path = java.nio.file.Paths.get(s"bench/logs/${runStamp}_${name}_$tag.log")
      try {
        java.nio.file.Files.createDirectories(path.getParent)
        val sw = new java.io.StringWriter()
        e.printStackTrace(new java.io.PrintWriter(sw))
        java.nio.file.Files.writeString(path,
          s"query=$name tag=$tag sf=$sfDir ts=${java.time.Instant.now()}\n" +
          s"class=${e.getClass.getName}\nmessage=${e.getMessage}\n\n$sw")
      } catch { case w: Throwable =>
        System.err.println(s"[bench] failure-log write failed: ${w.getMessage}")
      }
      path.toString
    }
    if (warmup) {
      queries.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { run(fn, sfDir); true } catch {
          case e: Throwable => logFailure("warmup", name, e); false
        }
        progress("warmup", name, (System.nanoTime() - t0) / 1e9, ok)
      }
      spark.catalog.clearCache()
      graft.vector.ProductQuantizer.releaseCentroids()
    }
    // a failing query must NOT vanish into a near-zero time: failures
    // are counted and named in the JSON so the bench can't silently
    // understate while masking breakage
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "2").toInt.max(1)
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    // name -> (exception class, stack-log path) of the FIRST failing
    // pass, for the history line
    val failedDetail = scala.collection.mutable.LinkedHashMap.empty[String, (String, String)]
    // One timed execution of one query. Failure bookkeeping is
    // synchronized because concurrent mode calls this from pool threads.
    def timedOne(it: Int, name: String,
                 fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (String, (Double, Boolean)) = {
      val t0 = System.nanoTime()
      val ok =
        try { run(fn, sfDir); true }
        catch { case e: Throwable =>
          val log = logFailure(s"pass$it", name, e)
          failed.synchronized {
            failed += name
            if (!failedDetail.contains(name))
              failedDetail(name) = (e.getClass.getName, log)
          }
          System.err.println(
            s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage} (stack: $log)")
          false
        }
      val secs = (System.nanoTime() - t0) / 1e9
      progress(s"pass$it", name, secs, ok)
      name -> (secs, ok)
    }
    // wall-clock of each whole pass — in concurrent mode THIS is the
    // headline number (per-query times are contended and only sum to
    // CPU-ish attribution, not elapsed time)
    val passWalls = scala.collection.mutable.ArrayBuffer.empty[Double]
    val passes = (1 to iters).map { it =>
      val w0 = System.nanoTime()
      val pass = concurrent match {
        case None =>
          queries.map { case (name, fn) => timedOne(it, name, fn) }
        case Some(n) =>
          val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
          try {
            import scala.concurrent.{Await, ExecutionContext, Future}
            import scala.concurrent.duration.Duration
            implicit val ec: ExecutionContext =
              ExecutionContext.fromExecutorService(pool)
            val futs = queries.map { case (name, fn) =>
              Future {
                // one FAIR pool per query: equal weight, so a heavy
                // probe can't starve the scheduler-floor queries whose
                // setup time this mode exists to amortize
                spark.sparkContext.setLocalProperty(
                  "spark.scheduler.pool", s"bench_$name")
                timedOne(it, name, fn)
              }
            }
            Await.result(Future.sequence(futs), Duration.Inf)
          } finally pool.shutdown()
      }
      passWalls += (System.nanoTime() - w0) / 1e9
      spark.catalog.clearCache()
      graft.vector.ProductQuantizer.releaseCentroids()
      pass
    }
    // min across SUCCESSFUL iterations only: failures typically abort
    // fast, and letting a near-zero failing time win the min would
    // understate a query that also succeeded slowly in another pass.
    // Only a query that failed in every pass reports a failing time.
    val results = queries.map { case (name, _) =>
      val times = passes.map(_.toMap.apply(name))
      val okTimes = times.collect { case (t, true) => t }
      name -> (if (okTimes.nonEmpty) okTimes.min else times.map(_._1).min)
    }
    // sequential: total = sum of per-query minimums (the r1+ headline).
    // concurrent: total = min batch wall-clock — the number the mode
    // exists to measure; the per-query sum would double-count overlap.
    val total =
      if (concurrent.isDefined) passWalls.min else results.map(_._2).sum
    // production/probe split (VERDICT r14 #3): the 11 truth probes are
    // Θ(output) by definition and cost ~half of sf10 wall-clock; every
    // line carries both components so decade tables can track the
    // production paths' scaling without losing the audit signal. In
    // concurrent mode both sides come from the contended per-query
    // sums (subtracting a contended sum from a wall total would go
    // negative — observed r16).
    val probeTotal = results.collect {
      case (n, t) if probeQueries.contains(n) => t }.sum
    val prodTotal = results.map(_._2).sum - probeTotal
    def r3(v: Double): String = f"$v%.3f"
    // Per-family subtotals (family = leading alpha prefix of the query
    // name): the unit at which cross-round drift is attributable —
    // "new heavy family" vs "old family got slower" — checked against
    // the committed budgets below.
    val families = results
      .groupBy { case (name, _) => name.takeWhile(_.isLetter) }
      .map { case (f, rs) => f -> rs.map(_._2).sum }
      .toSeq.sortBy(-_._2)
    // Budget check (bench/family_budgets.tsv, committed): WARN — never
    // fail — when a family's subtotal exits its recorded band by 2×
    // (with a +1 s floor so scheduler-floor families don't trip on
    // ambient ±30% single-run variance), or when a family is new.
    // Budgets are recorded at one SF and only checked at that SF.
    val budgetsPath = java.nio.file.Paths.get("bench/family_budgets.tsv")
    // skip-probes runs are partial within the nn/dd/fz/sd/bj/sm
    // families — their subtotals would trip the bands spuriously, same
    // rationale as the `only` exclusion above
    if (only.isEmpty && !skipProbes && concurrent.isEmpty &&
        java.nio.file.Files.exists(budgetsPath)) {
      val lines = scala.jdk.CollectionConverters
        .ListHasAsScala(java.nio.file.Files.readAllLines(budgetsPath)).asScala
      val budgetSf = lines.collectFirst {
        case l if l.startsWith("#sf=") => l.stripPrefix("#sf=") }
      if (budgetSf.exists(sfDir.endsWith)) {
        val budgets = lines.filterNot(_.startsWith("#")).flatMap { l =>
          l.split('\t') match {
            case Array(f, v) => Some(f -> v.toDouble)
            case _ => None
          }
        }.toMap
        families.foreach { case (f, t) =>
          budgets.get(f) match {
            case None => System.err.println(
              f"[bench] WARN family '$f' ($t%.2f s) has no recorded budget - add it to bench/family_budgets.tsv")
            case Some(b) if t > math.max(2 * b, b + 1.0) => System.err.println(
              f"[bench] WARN family '$f' subtotal $t%.2f s exceeds 2x its recorded budget $b%.2f s - regression or a grown family; investigate, then re-record")
            case _ => ()
          }
        }
      }
    }
    // The printed line must survive a tail-capture of the run log
    // (round 1's full 85-query map exceeded it and failed to parse), so
    // it carries the slowest 30 queries; the complete per-query map +
    // family subtotals go to target/bench_full.json AND are appended to
    // the committed bench/history.jsonl — the cross-round per-query
    // history the round artifacts alone don't preserve.
    val top = results.sortBy(-_._2).take(30)
      .map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val all = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val famJson = families.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val stamp = java.time.Instant.now().toString
    // Subset runs (SPARK_GRAFT_BENCH_ONLY) are recorded WITH their
    // selector: a partial total in history.jsonl was previously
    // distinguishable from a full run only by n_queries, which
    // contaminated cross-round drift analysis; "only" makes the subset
    // explicit and filterable. "iters" records the min-of-N discipline
    // the number was taken under (the host is measurably bimodal —
    // NOTES_r9; single-pass and min-of-2 totals are not comparable).
    val onlyJson = only.map(_.map("\"" + _ + "\"").mkString(",\"only\":[", ",", "]")).getOrElse("")
    // Read-only-corpus gate: the fingerprint recomputed AFTER the timed
    // passes must equal the start-of-run one — the sf corpora are shared
    // across rounds, and a query that writes through into the corpus dir
    // would silently corrupt every later decade measurement. A dirty
    // corpus is recorded in the history line and fails the process.
    val (corpusIdAfter, _, _) = corpusFingerprint(sfDir)
    val corpusDirty = corpusIdAfter != corpusId
    if (corpusDirty) System.err.println(
      s"[bench] ERROR corpus dir $sfDir was MODIFIED during the run " +
        s"($corpusId -> $corpusIdAfter) - a query wrote through into the corpus")
    val corpusJson =
      s""","corpus":{"id":"$corpusId","files":$corpusFiles,"bytes":$corpusBytes,"dirty":$corpusDirty}"""
    val splitJson =
      s""","total_production":${r3(prodTotal)},"total_probe":${r3(probeTotal)},"skip_probes":$skipProbes"""
    // concurrent lines are a separate population: flagged with the pool
    // width so cross-round tooling never compares them to sequential
    // totals (per-query values on such a line are contended)
    val concurrentJson = concurrent.map(n => s""","concurrent":$n""").getOrElse("")
    val failedDetailJson = failedDetail.map { case (n, (cls, log)) =>
      s""""$n":{"class":"$cls","log":"$log"}""" }.mkString(",\"failed_detail\":{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","ts":"$stamp","iters":$iters$onlyJson$splitJson$concurrentJson$calibJson,"n_queries":${results.size},"n_failed":${failed.size},"failed":$failedJson$failedDetailJson,"families":$famJson,"queries":$all$corpusJson,"sf":"$sfDir"}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/bench_full.json"), fullLine)
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("bench"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("bench/history.jsonl"), fullLine + "\n",
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] history append failed: ${e.getMessage}")
    }
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","iters":$iters$onlyJson$splitJson$concurrentJson,"n_queries":${results.size},"n_failed":${failed.size},"failed":$failedJson,"queries":$top,"sf":"$sfDir"}""")
    spark.stop()
    if (corpusDirty) sys.exit(1)
    // Exit nonzero past a failure threshold (ADVICE r15, medium): the
    // r14-style SIGTERM cascade failed 183 queries yet exited 0, so
    // every pipeline above it reported success. Threshold (not >0)
    // matches decade_table.py's MAX_ACCEPTED_FAILURES=3 — rare 1-in-10
    // codec transients shouldn't abort a 3 h decade pipeline, a
    // cascade must.
    val maxFailed = sys.env.getOrElse("SPARK_GRAFT_MAX_FAILED", "3").toInt
    if (failed.size > maxFailed) {
      System.err.println(
        s"[bench] ${failed.size} queries failed (> $maxFailed allowed) - exiting nonzero")
      sys.exit(2)
    }
  }
}

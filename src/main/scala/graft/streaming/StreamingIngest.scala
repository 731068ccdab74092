package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

/** Typed event row for stateful streaming. */
final case class UserEvent(user_id: Long, value: Double)
/** Accumulated per-user state/output. */
final case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

/** Structured Streaming forms of the engine's ingest and sessionization
  * (SURVEY §2.11 — the reference is weekly batch; this is the "if
  * streaming is wanted later" path, built on the same operators).
  *
  * Scale notes: file-source streaming scales by listing cost — at
  * production scale use a notification-based source. Watermarked
  * dropDuplicates bounds state; windowed aggs emit on watermark close.
  */
object StreamingIngest {

  /** Streaming dedup-ingest: file source → watermark → key dedup within
    * the watermark — the streaming analogue of the batch anti-join dedup
    * (D1-D3). */
  def dedupStream(spark: SparkSession, schema: StructType, srcDir: String,
                  eventTimeCol: String, watermark: String,
                  keys: Seq[String]): DataFrame =
    spark.readStream.schema(schema).parquet(srcDir)
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Windowed per-type counts with watermarking — the streaming form of
    * the weekly report aggregations (A2/A4). */
  def windowedCounts(events: DataFrame, eventTimeCol: String,
                     window_ : String, watermark: String): DataFrame =
    events.withWatermark(eventTimeCol, watermark)
      .groupBy(window(col(eventTimeCol), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Gap-based streaming sessionization via session_window — shares
    * semantics with the batch graft.events.Sessions. */
  def streamingSessions(events: DataFrame, eventTimeCol: String,
                        gap: String, watermark: String): DataFrame =
    events.withWatermark(eventTimeCol, watermark)
      .groupBy(col("user_id"), session_window(col(eventTimeCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))

  /** Custom keyed state via flatMapGroupsWithState: per-user running
    * totals that emit a record on every update — the shape that covers
    * everything session_window can't express (cross-session counters,
    * custom eviction, alerting thresholds). State is bounded per key
    * (one UserTotals each); timeouts would evict idle users at scale. */
  def runningUserTotals(events: org.apache.spark.sql.Dataset[UserEvent]):
      org.apache.spark.sql.Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserTotals, UserTotals](
        OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state) =>
          val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
          var n = prev.n_events
          var v = prev.total_value
          rows.foreach { e => n += 1; v += e.value }
          val next = UserTotals(uid, n, v)
          state.update(next)
          Iterator(next)
      }
  }

  /** Watermarked stream-stream interval join: right-side events in
    * [leftTs, leftTs + window] for the same key (e.g. purchases within
    * 7 days of a signup), with both sides' state bounded by watermark +
    * interval — the Structured Streaming join shape where the engine
    * can actually EVICT state, unlike an unconstrained equi-join.
    * Right columns come back prefixed `r_`. Works identically on batch
    * frames (watermark is a no-op there), which is how the spec proves
    * stream==batch. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   watermark: String, window: String): DataFrame = {
    val r0 = right.columns.foldLeft(right)((df, c) =>
      df.withColumnRenamed(c, s"r_$c"))
    val (l, r) =
      if (left.isStreaming)
        (left.withWatermark(leftTs, watermark),
          r0.withWatermark(s"r_$rightTs", watermark))
      else (left, r0)
    l.join(r, expr(
      s"$key = r_$key AND r_$rightTs >= $leftTs" +
        s" AND r_$rightTs <= $leftTs + interval $window"))
  }

  /** Streaming corpus curation: the filter stage of
    * graft.text.CurationPipeline over a document stream, with running
    * kept/reject counts per source. langId/qualityScore are pure column
    * expressions, so they run in a stream UNCHANGED — the point of
    * keeping scoring scan-side: a curation rule deployed on the batch
    * corpus applies to the live feed with zero reimplementation. (The
    * dedup stage is the one part that needs the watermarked form —
    * `dedupStream` keyed on the content fingerprint — because it is a
    * stateful shuffle, not a map.) */
  def curationCounts(docs: DataFrame, keepLangs: Seq[String],
                     minQuality: Double): DataFrame = {
    import graft.text.TextFunctions
    docs
      .withColumn("lang_pred", TextFunctions.langId(col("text")))
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .withColumn("bucket",
        when(!col("lang_pred").isin(keepLangs: _*), lit("lang_filtered"))
          .when(col("quality") < minQuality, lit("low_quality"))
          .otherwise(lit("kept")))
      .groupBy("source", "bucket").agg(count(lit(1)).as("n"))
  }

  /** Streaming PII scrub: the redaction pass (detect count + regex
    * replace, matching pii01's batch semantics) over a live document
    * feed. Stateless map — no watermark, no state store: the scrubbed
    * stream is exactly the batch projection applied per micro-batch,
    * which is what makes "redact before anything else touches the
    * feed" a deployable invariant rather than a batch-only audit. */
  def redactStream(docs: DataFrame, pattern: String,
                   replacement: String = "[PII]"): DataFrame =
    docs.select(col("doc_id"), col("source"),
      regexp_count(col("text"), lit(pattern)).cast("long").as("n_pii"),
      regexp_replace(col("text"), pattern, replacement).as("text"))

  /** Streaming DECONTAMINATION: per-document count of benchmark grams
    * present, over a live document feed. The benchmark gram set is the
    * STATIC side of a stream-static left-semi join — small by nature,
    * so Spark broadcasts it into every micro-batch and the stage stays
    * stateless (no watermark, no state store; the per-doc count is the
    * streaming aggregate). shingle_hashes emits DISTINCT grams per
    * document, so count(*) after the semi-join equals the distinct
    * shared-gram count without needing a (streaming-unsupported)
    * count_distinct. Same hygiene rule as the batch dc01 pass, applied
    * to the feed with zero reimplementation. */
  def decontaminationCounts(docs: DataFrame, benchGrams: DataFrame,
                            k: Int = 3): DataFrame =
    docs.select(col("doc_id"),
      explode(graft.text.ShingleHashesExpr.shingleHashes(
        graft.text.TextFunctions.tokens(col("text")), k)).as("g"))
      .join(benchGrams.select(col(benchGrams.columns.head).as("g")), Seq("g"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))

  /** Streaming REPETITION SIGNALS (rp01's Gopher stats over a live
    * feed): the stats are DOC-LOCAL — every output row derives from
    * exactly one input row — so applying the batch operator per
    * micro-batch via foreachBatch is EXACT, independent of how rows
    * split across batches. No state store, no watermark; `sink`
    * receives each micro-batch's finished stats (write to parquet,
    * push to a topic, …). */
  def repetitionStatsStream(docs: DataFrame)
                           (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch((b: DataFrame, _: Long) =>
        sink(graft.text.Repetition.repetitionStats(b)))
      .start()

  /** Streaming BOILERPLATE STRIP (bp01 over a live feed): the segment
    * blocklist is derived ONCE from the batch corpus
    * (`TextDedup.boilerplateSegments`) and becomes the static side —
    * per micro-batch the strip is row-local segmentation + one
    * broadcastable anti-join + doc-local rebuild, so the pass is
    * stateless and stream==batch exact whenever the blocklist matches
    * the batch run's. (Document frequency is a CORPUS property; a
    * live feed deliberately applies the warehouse-derived rule rather
    * than re-estimating df inside the stream.) */
  def boilerplateStripStream(docs: DataFrame, blocklist: DataFrame,
                             segTokens: Int)
                            (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch((b: DataFrame, _: Long) =>
        sink(graft.text.TextDedup.boilerplateStripAgainst(b, blocklist, segTokens)))
      .start()

  /** STREAMING FIRST-WINS INGEST — the generic form of the HHS
    * pipeline's dedup stage, pinned stream==batch by StreamingSpec on
    * a duplicate-heavy fixture (r14, when the batch kernel moved from
    * a row_number window to the skew-immune min(struct) aggregate).
    * Per micro-batch: [[graft.etl.Dedup.firstOccurrenceWins]] drops
    * in-batch duplicates (the SAME kernel as batch — the parity pin
    * covers whatever shape the kernel carries), then an anti-join
    * against the keys already in `outDir` drops cross-batch
    * duplicates, then the survivors append. Batches run sequentially,
    * so batch N's appends are batch N+1's existing side; equal to the
    * batch kernel over the concatenated input whenever files arrive in
    * order and `orderCol` grows with arrival (the file source's
    * contract here, and the same "first = arrival order" rule the
    * reference's loader implements, load_hhs.py:75). */
  def firstWinsIngestStream(stream: DataFrame, keys: Seq[String],
                            orderCol: String, outDir: String,
                            checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream.trigger(Trigger.AvailableNow())
      // Durable checkpoint by default (like the HHS streams above): an
      // interrupted run resumes from the last committed batch instead
      // of re-listing the whole source and leaning on the anti-join
      // for idempotence. Callers can point it elsewhere (or at a temp
      // dir in tests).
      .option("checkpointLocation",
              checkpointDir.getOrElse(s"$outDir/_checkpoints/first_wins"))
      .foreachBatch { (b: DataFrame, _: Long) =>
        val sp = b.sparkSession
        val existing =
          if (java.nio.file.Files.exists(java.nio.file.Paths.get(outDir)))
            sp.read.schema(b.schema).parquet(outDir)
          else sp.createDataFrame(sp.sparkContext.emptyRDD[Row], b.schema)
        graft.etl.Dedup.antiJoinExisting(
            graft.etl.Dedup.firstOccurrenceWins(b, keys, orderCol),
            existing, keys)
          .write.mode("append").parquet(outDir)
      }.start()

  /** STREAMING LATEST-WINS INGEST — the CDC-flavored complement of
    * [[firstWinsIngestStream]], running the SAME batch kernel
    * ([[graft.etl.Dedup.latestWins]]) per micro-batch so the stream==
    * batch parity pin (StreamingSpec, r15) covers whatever shape the
    * kernel carries (the r14 min/max(struct) aggregate today). Unlike
    * first-wins, a later batch can SUPERSEDE stored rows, so an
    * append-only sink can't express it; state lives in the
    * generational table protocol ([[maintainCdcState]]'s): per batch,
    * current state ∪ new rows → latestWins → gen-<batchId> commit,
    * _SUCCESS-gated, replay-idempotent (a replayed batch rebuilds the
    * same generation from the same <batchId-exclusive state). Read the
    * live table with [[currentAggState]]. Equal to the batch kernel
    * over the concatenated input because latestWins is associative
    * over row sets: max-by-(orderCol, tieCol) of a union is the max of
    * per-part maxes. */
  def latestWinsIngestStream(stream: DataFrame, keys: Seq[String],
                             orderCol: String, tieCol: String,
                             stateDir: String,
                             checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
              checkpointDir.getOrElse(s"$stateDir/_checkpoints/latest_wins"))
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        val sp = b.sparkSession
        val merged = currentAggState(sp, stateDir, maxExclusive = Some(batchId))
          .map(_.unionByName(b)).getOrElse(b)
        graft.etl.Dedup.latestWins(merged, keys, orderCol, tieCol)
          .write.mode("overwrite").parquet(s"$stateDir/gen-$batchId")
        pruneGenerations(sp, stateDir, keepAtOrAbove = batchId - 1)
      }.start()

  /** STREAMING END-TO-END HHS INGEST: the whole batch warehouse load
    * ([[graft.warehouse.HhsPipeline.load]]) as one live pipeline —
    * file source → clean → validation split → watermarked key dedup
    * (`dropDuplicatesWithinWatermark`, SURVEY §2.11's named shape) →
    * warehouse append. Returns the (valid-path, reject-path) queries;
    * await both.
    *
    * Stage-by-stage parity with batch:
    *  - clean + validation are pure column expressions, so they run on
    *    the stream UNCHANGED and split BEFORE dedup, exactly like
    *    batch (an invalid first occurrence must not shadow a valid
    *    duplicate, and rejects must include duplicate invalid rows).
    *  - (hospital_pk, collection_week) dedup happens IN the stream:
    *    the watermark on collection_week bounds state, and
    *    dropDuplicatesWithinWatermark drops cross-batch duplicates
    *    without touching the warehouse. Streaming "first" is arrival
    *    order — equal to the batch file-order rule whenever files
    *    arrive in listing order (the file source's contract here).
    *  - per micro-batch (foreachBatch), the remaining BATCH stages
    *    run against current warehouse state: first-per-hospital_pk,
    *    anti-join vs existing keys (covers pre-existing warehouse rows
    *    and dups beyond the watermark horizon), three table appends.
    *    Batches are sequential, so batch N's appends are batch N+1's
    *    existing side.
    * At scale the state store holds only keys within the watermark,
    * and every per-batch stage is the batch operator itself — the
    * proof obligation (stream == batch on the same files) is pinned
    * by StreamingSpec against a fixture warehouse. */
  def hhsIngestStream(spark: SparkSession, srcDir: String, warehouseDir: String,
                      rejectDir: String, watermark: String = "30 days",
                      maxFilesPerTrigger: Int = 1)
      : (org.apache.spark.sql.streaming.StreamingQuery,
         org.apache.spark.sql.streaming.StreamingQuery) = {
    import graft.warehouse.{HhsPipeline, Schemas}
    import graft.etl.{Dedup, Validation}
    def readOrEmpty(sp: SparkSession, path: String, schema: StructType): DataFrame =
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
        sp.read.schema(schema).parquet(path)
      else sp.createDataFrame(sp.sparkContext.emptyRDD[Row], schema)

    val raw = spark.readStream
      .option("header", "true").schema(Schemas.hhsRawCsv)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).csv(srcDir)
    val (valid, rejects) = Validation.split(
      HhsPipeline.clean(raw), HhsPipeline.validationRules)

    val deduped = valid
      .withColumn("__event_ts", col("collection_week").cast("timestamp"))
      .withWatermark("__event_ts", watermark)
      .dropDuplicatesWithinWatermark("hospital_pk", "collection_week")
      .drop("__event_ts")
    val validQ = deduped.writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$warehouseDir/_checkpoints/hhs_valid")
      .foreachBatch { (b: DataFrame, _: Long) =>
        val sp = b.sparkSession
        val existingHospitals = readOrEmpty(
          sp, s"$warehouseDir/hospitals", Schemas.hospitals)
        val existingBeds = readOrEmpty(
          sp, s"$warehouseDir/hospital_bed_information",
          Schemas.hospitalBedInformation)
        val withOrder = b.withColumn("__file_order", monotonically_increasing_id())
        val firstPerHospital = Dedup.firstOccurrenceWins(
          withOrder, Seq("hospital_pk"), "__file_order")
        val newHospitalRows = Dedup.antiJoinExisting(
          firstPerHospital, existingHospitals, Seq("hospital_pk"))
        newHospitalRows.select(col("hospital_pk"), col("hospital_name"))
          .write.mode("append").parquet(s"$warehouseDir/hospitals")
        newHospitalRows.select(
          col("hospital_pk").as("hospital_fk"),
          col("state"), col("address"), col("city"), col("zip"),
          col("fips_code"), col("geocoded_hospital_address"))
          .write.mode("append").parquet(s"$warehouseDir/hospital_locations")
        Dedup.antiJoinExisting(
          b.select((col("hospital_pk").as("hospital_fk") +:
            col("collection_week") +:
            Schemas.hhsMetricColumns.map(col)).toIndexedSeq: _*),
          existingBeds, Seq("hospital_fk", "collection_week"))
          .write.mode("append").partitionBy("collection_week")
          .parquet(s"$warehouseDir/hospital_bed_information")
      }.start()

    val rejectQ = rejects.writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$warehouseDir/_checkpoints/hhs_rejects")
      .option("header", "true")
      .option("path", s"$rejectDir/hhs")
      .outputMode(OutputMode.Append()).format("csv").start()
    (validQ, rejectQ)
  }

  /** STREAMING MATERIALIZED-VIEW MAINTENANCE: keep a standing
    * aggregate (graft.etl.IncrementalAgg's algebraic per-key state)
    * current against a live feed — the streaming form of ia01. Per
    * micro-batch: aggregate ONLY the batch's rows into a delta state,
    * merge with the standing state, write the result as a NEW
    * generation directory (`gen-<batchId>`), and let readers resolve
    * the highest fully-committed generation (`_SUCCESS` present) —
    * commit-by-visibility, no pointer file to swap racily. Cost per
    * batch ∝ batch + state size; the raw feed is never re-scanned.
    *
    * Exactness does not depend on batch boundaries: count/sum are
    * associative, min/max commutative-idempotent, so ANY slicing of
    * the feed folds to the identical state (the spec pins stream ==
    * batch bit-for-bit across forced multi-batch runs). Re-running a
    * batch id is idempotent because the merge reads the highest
    * generation BELOW the current batch id, never its own output.
    * Generations older than the previous one are best-effort pruned.
    * (For cross-restart exactly-once against arbitrary sinks, pair
    * with a checkpointed source and a transactional table format —
    * this operator is the engine-side state math done right.) */
  def maintainAggState(stream: DataFrame, keys: Seq[String], valueCol: String,
                       stateDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        import graft.etl.IncrementalAgg
        val sp = b.sparkSession
        val delta = IncrementalAgg.state(b, keys, valueCol)
        val merged = currentAggState(sp, stateDir, maxExclusive = Some(batchId))
          .map(cur => IncrementalAgg.merge(cur, delta, keys)).getOrElse(delta)
        merged.write.mode("overwrite").parquet(s"$stateDir/gen-$batchId")
        pruneGenerations(sp, stateDir, keepAtOrAbove = batchId - 1)
      }.start()

  /** Streaming HEAVY-HITTER SKETCH maintenance: per micro-batch build
    * a CountMin blob over `keyCol` (LongType keys — hash upstream)
    * and ADD it into the standing blob. CMS is a LINEAR sketch
    * (counters are sums), so the maintained state equals the
    * whole-history sketch BIT-FOR-BIT — stream==batch exact on the
    * blob, not merely within bounds — and any key's frequency
    * estimate is served from state without re-reading history.
    * Same generation-per-batch-id commit protocol as
    * [[maintainAggState]] (idempotent replays, _SUCCESS-gated reads,
    * pruning). The per-batch blob is depth×width×8 bytes REGARDLESS
    * of corpus size, so the driver-side head()+add is constant work —
    * the same class of driver scalar as the CC convergence probe. */
  def maintainSketchState(stream: DataFrame, keyCol: String, depth: Int,
                          width: Int, stateDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    pinBlobGeometry(stream.sparkSession, stateDir, s"cms:depth=$depth,width=$width")
    maintainBlobState(stream, stateDir,
      graft.sketch.CountMin.cm_agg(col(keyCol), depth, width),
      graft.sketch.CountMin.addBlobs)
  }

  /** Streaming BLOOM-FILTER maintenance: the membership sibling of
    * [[maintainSketchState]] — per-batch Bloom blobs OR into the
    * standing filter (OR is associative, commutative, IDEMPOTENT, so
    * the state equals the whole-history filter bit-for-bit and
    * replays are harmless by algebra, on top of the generation
    * protocol's idempotence). This is dc02's decontamination filter
    * kept current incrementally: a benchmark/blocklist feed maintains
    * the filter; scan-side `might_contain` pruning then never
    * re-reads filter history. */
  def maintainBloomState(stream: DataFrame, keyCol: String, numBits: Int,
                         k: Int, stateDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    pinBlobGeometry(stream.sparkSession, stateDir, s"bloom:numBits=$numBits,k=$k")
    maintainBlobState(stream, stateDir,
      graft.sketch.Bloom.bloom_agg(col(keyCol), numBits, k),
      graft.sketch.Bloom.orBlobs)
  }

  /** Pin a blob-state directory to ONE sketch geometry. Blob merges
    * (addBlobs/orBlobs) can only check byte LENGTH, which is necessary
    * but not sufficient: a 4×8192 and an 8×4096 CMS have identical blob
    * sizes and would merge into a silently-corrupted sketch. So the
    * first maintainer of a stateDir writes `_blob_geometry` (the full
    * parameter descriptor) and every later maintainer must present the
    * identical descriptor — a changed depth/width/k against an existing
    * state dir fails FAST at start(), before any batch merges. */
  private def pinBlobGeometry(spark: SparkSession, stateDir: String,
                              descriptor: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$stateDir/_blob_geometry")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val in = fs.open(p)
      val existing = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                     finally in.close()
      require(existing == descriptor,
        s"blob state dir $stateDir is pinned to geometry '$existing' " +
        s"but the maintainer was configured with '$descriptor'; " +
        "changing sketch parameters requires a fresh state dir")
    } else {
      val out = fs.create(p, false)
      try out.write(descriptor.getBytes("UTF-8")) finally out.close()
    }
  }

  /** Shared blob-state loop: per batch, evaluate `buildAgg` over the
    * batch (one fixed-size blob) and fold it into the standing blob
    * with `merge` — same generation-per-batch-id protocol as
    * [[maintainAggState]]. The blob is corpus-size-independent, so
    * the driver-side head()+merge is constant work (the CC
    * convergence-probe class of driver scalar). */
  private def maintainBlobState(stream: DataFrame, stateDir: String,
                                buildAgg: org.apache.spark.sql.Column,
                                merge: (Array[Byte], Array[Byte]) => Array[Byte])
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        val sp = b.sparkSession
        val delta = b.agg(buildAgg.as("blob")).head().getAs[Array[Byte]]("blob")
        val merged = currentAggState(sp, stateDir, maxExclusive = Some(batchId))
          .map(cur => merge(cur.head().getAs[Array[Byte]]("blob"), delta))
          .getOrElse(delta)
        import sp.implicits._
        Seq(merged).toDF("blob").coalesce(1)
          .write.mode("overwrite").parquet(s"$stateDir/gen-$batchId")
        pruneGenerations(sp, stateDir, keepAtOrAbove = batchId - 1)
      }.start()

  /** Streaming CDC MATERIALIZATION: each micro-batch of I/U/D change
    * rows merges into the generational state table via
    * [[graft.etl.Upsert.applyCdc]] with keepTombstones = true — the
    * winning delete rows PERSIST in state so a late-arriving lower-seq
    * entry in a later batch cannot resurrect a deleted key (the
    * classic streaming-CDC correctness trap; a batch engine re-reading
    * the full log gets this for free, incremental state must carry the
    * tombstone). Same commit protocol as [[maintainAggState]]:
    * generation-per-batch-id, _SUCCESS-gated reads, replay-idempotent.
    * Read the live table with [[currentCdcState]] (filters
    * tombstones). */
  def maintainCdcState(stream: DataFrame, keys: Seq[String], seqCol: String,
                       opCol: String, stateDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        import graft.etl.Upsert
        val sp = b.sparkSession
        val merged = currentAggState(sp, stateDir, maxExclusive = Some(batchId))
          .map(_.unionByName(b)).getOrElse(b)
        Upsert.applyCdc(merged, keys, seqCol, opCol, keepTombstones = true)
          .write.mode("overwrite").parquet(s"$stateDir/gen-$batchId")
        pruneGenerations(sp, stateDir, keepAtOrAbove = batchId - 1)
      }.start()

  /** The live CDC table: latest committed generation minus tombstones. */
  def currentCdcState(spark: SparkSession, stateDir: String,
                      opCol: String = "op"): Option[DataFrame] =
    currentAggState(spark, stateDir).map(_.filter(col(opCol) =!= "D"))

  /** The standing state: highest fully-committed generation in
    * `stateDir` (below `maxExclusive` if given); None before the first
    * commit. */
  def currentAggState(spark: SparkSession, stateDir: String,
                      maxExclusive: Option[Long] = None): Option[DataFrame] =
    committedGens(spark, stateDir)
      .filter(g => maxExclusive.forall(g < _)).maxOption
      .map(g => spark.read.parquet(s"$stateDir/gen-$g"))

  private def committedGens(spark: SparkSession, stateDir: String): Seq[Long] = {
    val dir = new org.apache.hadoop.fs.Path(stateDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen-"))
      .map(_.getPath.getName.stripPrefix("gen-").toLong)
      .filter(g => fs.exists(
        new org.apache.hadoop.fs.Path(s"$stateDir/gen-$g/_SUCCESS")))
  }

  private def pruneGenerations(spark: SparkSession, stateDir: String,
                               keepAtOrAbove: Long): Unit = {
    val dir = new org.apache.hadoop.fs.Path(stateDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    committedGens(spark, stateDir).filter(_ < keepAtOrAbove).foreach { g =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$stateDir/gen-$g"), true)
    }
  }

  /** Run a streaming frame to completion against currently-available
    * input via the memory sink; returns the materialized result. Batch
    * test harness for streaming semantics. */
  def runToMemory(df: DataFrame, name: String,
                  mode: OutputMode = OutputMode.Append): DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory")
      .queryName(name).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    df.sparkSession.table(name)
  }
}

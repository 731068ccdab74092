package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PRODUCT QUANTIZATION (Jégou et al., the FAISS IVF-PQ compression
  * step): split each vector into `m` subvectors, learn an independent
  * k-entry codebook per subspace, encode every vector as its m nearest
  * code ids — dim×4 bytes compress to m small ints, and the exact
  * per-subspace squared distance to the chosen code IS the vector's
  * quantization error, decomposed.
  *
  * Same integer-exact Lloyd math as [[QuantizedKMeans]] (micro-unit
  * coordinates, k-lowest-id init, argmin ties to the lowest cell,
  * exact floor-div centroid updates), so the ENTIRE train+encode
  * pipeline — every codebook centroid, every code assignment, every
  * error term — is a total deterministic function of the input,
  * replayable cross-engine. Float PQ trainers can't make that claim;
  * this one proves the math, and the production path swaps in more
  * iterations/codes with the same shapes.
  *
  * Scale shape — LONG FORMAT, all m subspaces in one pass (the r9
  * redesign; the r8 version ran m independent k-means branches, i.e.
  * m corpus scans per Lloyd round and an m-way union on the query
  * side): each vector explodes once into m (sub_id, subvector) rows,
  * and every stage keys by sub_id —
  *  - TRAIN: per Lloyd round, ONE corpus scan; assignment is a
  *    broadcast join against the m×k codebook rows (row-local argmin,
  *    no corpus shuffle); the update is one partial-agg shuffle keyed
  *    (sub_id, cell, dim) whose output is m×k×(dim/m) = k×dim rows
  *    regardless of corpus size.
  *  - ENCODE: one scan, one broadcast argmin — m codes per vector.
  * At 100 TB you'd train codebooks on a capped sample and run ONE
  * full-corpus encode pass — that recipe is the `trainMod` parameter
  * of [[encode]]/[[adcTopK]] (train on the deterministic 1/trainMod
  * id-slice, encode everything; the IvfIndex.build pattern, but as a
  * DETERMINISTIC slice rather than file-order limit, so the sampled
  * path stays replayable cross-engine — nn12 oracle-matches it in
  * DuckDB, and ProductQuantizerSpec pins recall parity vs full
  * training). The long format is exactly that encode pass, m× fewer
  * scans than the branch-per-subspace plan at identical results
  * (bit-for-bit: ProductQuantizerSpec pins m=1 ≡ plain k-means, and
  * vq02/nn08/nn09/nn11 hash-match the same DuckDB replays as before
  * the redesign).
  */
object ProductQuantizer {

  /** Unpersist the codebook frame [[adcTopK]] cached (one m×k-row
    * frame per call — the r8 leak, closed). Delegates to the central
    * shared-plan registry, which also covers BPE merge vocabularies
    * and LSH signature frames. */
  def releaseCentroids(): Unit =
    org.apache.spark.sql.graftbridge.GraftSqlBridge.releaseShared()

  /** `slice` silently ignores trailing dimensions when `dims` under-
    * states the true vector length, so codes/errors would be computed
    * on truncated vectors with no error anywhere. Guard: the length
    * check RIDES IN THE PLAN (the fq01 `assert_true` pattern) — every
    * row is verified where its vector is consumed and a mismatch
    * raises at execution, while plan construction stays zero-job
    * (LazinessSpec). Checking every row rather than one sampled row is
    * free inside codegen (an array-length compare) and strictly
    * stronger: a single ragged row can't slip past a sample. */
  private[graft] def dimsGuarded(df: DataFrame, dims: Int, vecCol: String): DataFrame =
    df.withColumn(vecCol,
      when(size(col(vecCol)) === dims, col(vecCol))
        .otherwise(raise_error(concat(
          lit(s"dims=$dims but column '$vecCol' has length "),
          size(col(vecCol)).cast("string"),
          lit(": slice() would silently truncate — pass the true vector length")))))

  /** Long quantized subspace format: one (keyCol, sub_id, q) row per
    * vector per subspace — quantization is elementwise, so slicing the
    * quantized array equals quantizing the slice. ONE scan emits all
    * m rows per vector; every downstream stage keys by sub_id. */
  private[graft] def subspaces(df: DataFrame, dims: Int, m: Int,
                        keyCol: String, vecCol: String): DataFrame = {
    val len = dims / m
    val slices = array((0 until m).map { s =>
      transform(slice(col(vecCol), s * len + 1, len), x => QuantizedKMeans.quant(x))
    }: _*)
    df.select(col(keyCol), posexplode(slices).as(Seq("sub_id", "q")))
      .withColumn("sub_id", col("sub_id").cast("long"))
  }

  /** All m codebooks, trained simultaneously: (sub_id, cell_id, c).
    * Init is the k lowest-id vectors (cell_id in id order — the
    * [[QuantizedKMeans.centroids]] init, computed ONCE on full vectors
    * and sliced, since every subspace picks the same k ids); each
    * Lloyd round is one corpus scan + one (sub,cell,dim)-keyed
    * partial-agg shuffle. Cells that lose every member disappear,
    * exactly as in the per-subspace trainer. */
  private[graft] def centroidsAll(guarded: DataFrame, dims: Int, m: Int, k: Int,
                           iters: Int, idCol: String, vecCol: String): DataFrame = {
    val initW = org.apache.spark.sql.expressions.Window.orderBy(col(idCol))
    // k lowest-id vectors; the k-row window is harmless (post-limit)
    val init = guarded.orderBy(col(idCol)).limit(k)
      .withColumn("cell_id", (row_number().over(initW) - 1).cast("long"))
    var cents = subspaces(init, dims, m, "cell_id", vecCol)
      .select(col("sub_id"), col("cell_id"), col("q").as("c"))
    val longQ = subspaces(guarded, dims, m, idCol, vecCol)
    // one Lloyd step: assign to nearest centroid (ties -> lowest cell),
    // then recompute each non-empty cell as the exact floor-div mean
    for (_ <- 1 to iters) {
      val assigned = longQ.join(broadcast(cents), "sub_id")
        .select(col("sub_id"), col(idCol), col("q"), col("cell_id"),
          QuantizedKMeans.dist2(col("q"), col("c")).as("d2"))
        .groupBy(col("sub_id"), col(idCol), col("q"))
        .agg(min(struct(col("d2"), col("cell_id"))).as("m"))
        .select(col("sub_id"), col("q"), col("m.cell_id").as("cell_id"))
      cents = assigned
        .select(col("sub_id"), col("cell_id"), posexplode(col("q")).as(Seq("i", "x")))
        .groupBy("sub_id", "cell_id", "i")
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .select(col("sub_id"), col("cell_id"), col("i"),
          expr("(s - pmod(s, n)) div n").as("v"))
        .groupBy("sub_id", "cell_id")
        .agg(sort_array(collect_list(struct(col("i"), col("v")))).as("sv"))
        .select(col("sub_id"), col("cell_id"),
          transform(col("sv"), s => s.getField("v")).as("c"))
    }
    cents
  }

  /** Argmin assignment of every (keyCol, sub_id) row to its nearest
    * centroid in that subspace (ties → lowest cell):
    * (keyCol, sub_id, cell_id, d2). Broadcast m×k codebook, row-local
    * argmin — no corpus shuffle before the key-grouped min. */
  private[graft] def assignAll(longQ: DataFrame, cents: DataFrame,
                        keyCol: String): DataFrame =
    longQ.join(broadcast(cents), "sub_id")
      .select(col("sub_id"), col(keyCol), col("cell_id"),
        QuantizedKMeans.dist2(col("q"), col("c")).as("d2"))
      .groupBy(col("sub_id"), col(keyCol))
      .agg(min(struct(col("d2"), col("cell_id"))).as("m"))
      .select(col(keyCol), col("sub_id"), col("m.cell_id").as("cell_id"),
        col("m.d2").as("d2"))

  /** Train + encode in long format: (idCol, sub_id, code, d2) — one
    * row per vector per subspace. `dims` must be the vector length and
    * divide evenly by `m` (slice would silently truncate otherwise —
    * guarded in-plan on every row). */
  /** Deterministic 1/trainMod training slice (ids ≡ 0 mod trainMod) —
    * the 100 TB sample cap as a filter, not a sort+limit: no global
    * order, no single-partition pull, and the sample is a pure function
    * of ids so the whole capped pipeline replays cross-engine (the
    * nn12 oracle). trainMod = 1 is full-corpus training, bit-identical
    * to the unsampled path. */
  private def trainSlice(guarded: DataFrame, trainMod: Long,
                         idCol: String): DataFrame = {
    require(trainMod >= 1, s"trainMod=$trainMod must be >= 1")
    if (trainMod == 1) guarded
    else guarded.filter(pmod(col(idCol), lit(trainMod)) === 0)
  }

  def encode(df: DataFrame, dims: Int, m: Int, k: Int, iters: Int,
             idCol: String = "vec_id", vecCol: String = "embedding",
             trainMod: Long = 1): DataFrame = {
    require(m >= 1 && dims % m == 0, s"m=$m must divide dims=$dims")
    val guarded = dimsGuarded(df, dims, vecCol)
    val cents = centroidsAll(trainSlice(guarded, trainMod, idCol),
      dims, m, k, iters, idCol, vecCol)
    assignAll(subspaces(guarded, dims, m, idCol, vecCol), cents, idCol)
      .select(col(idCol), col("sub_id"), col("cell_id").as("code"), col("d2"))
  }

  /** ADC top-k search (asymmetric distance computation — the PQ query
    * side): the corpus is represented ONLY by its codes; a query's
    * distance to a database vector is the sum over subspaces of the
    * exact quantized distance from the query's subvector to the
    * centroid the vector's code names. Per query that is an m×k
    * LOOKUP TABLE (computed once, k-bounded), and scoring is a
    * row-local m-fold array lookup — never a full-vector distance per
    * pair. Returns (qIdCol, idCol, adist) — the `topK` nearest by
    * approximate distance per query, ties by id.
    *
    * Scale shape (the r10 redesign): the pre-r10 plan joined the
    * corpus code rows against the LUT on (sub_id, cell_id) — with
    * only m×k distinct join keys EVERY query matches every code row,
    * so the join emitted corpus×queries×m rows into a
    * corpus×queries-group hash aggregate and a rank window sorted the
    * result: at sf10 that was a multi-billion-row shuffle (the
    * "failed to allocate page" GC storms) and ADC measured 4× SLOWER
    * than brute force. Now the corpus codes fold to ONE array<long>
    * row per vector, each query's LUT flattens to ONE dense
    * m×k array<long> (indexed sub·k + code; cells KMeans emptied stay
    * null and are never indexed), the queries side broadcasts, and
    * adist = Σ_s lut[s·k + codes[s]] is an unrolled codegen
    * element_at chain evaluated in the broadcast-nested-loop join's
    * output iterator — the bruteForceTopK shape, but m lookups per
    * pair instead of dims multiplies. The per-query top-k is
    * [[graft.topk.TopKAgg.min_k_long]] (map-side bounded heaps), so
    * the ONLY shuffles anywhere are the corpus-sized encode
    * aggregations and a queries×topK heap merge — the intermediate
    * pair stream never touches a shuffle at any corpus size. All
    * arithmetic stays in exact micro-unit longs: bit-identical
    * results to the joined form (nn08/nn09/nn11/nn12 hash-match the
    * same DuckDB replays).
    *
    * Definitional identity pinned by the spec: a query that is itself
    * in the corpus scores its OWN codes at exactly its `encode` error
    * sum. 100 TB: codes are m small ints per vector (the 4-byte→
    * sub-byte compression PQ exists for); the LUT frame is
    * queries×(m×k) longs and broadcast. The codebook frame is
    * persisted via the shared-plan registry (codes and LUT both
    * consume it; one m×k-row frame per call — Bench/Verify drop it
    * via [[releaseCentroids]]). */
  def adcTopK(corpus: DataFrame, queries: DataFrame, dims: Int, m: Int,
              k: Int, iters: Int, topK: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              qIdCol: String = "q_id", trainMod: Long = 1): DataFrame = {
    require(m >= 1 && dims % m == 0, s"m=$m must divide dims=$dims")
    require(topK >= 1)
    val guarded = dimsGuarded(corpus, dims, vecCol)
    val cents = org.apache.spark.sql.graftbridge.GraftSqlBridge.sharedInPlan(
      centroidsAll(trainSlice(guarded, trainMod, idCol),
        dims, m, k, iters, idCol, vecCol))
    // corpus side: m codes per vector folded to one array row,
    // ordered by sub_id (collect_list is unordered pre-sort;
    // sort_array on the (sub_id, cell_id) struct restores it)
    val codes = assignAll(subspaces(guarded, dims, m, idCol, vecCol), cents, idCol)
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("sub_id"), col("cell_id")))).as("__sc"))
      .select(col(idCol),
        transform(col("__sc"), s => s.getField("cell_id")).as("__codes"))
    // query side: dense per-query LUT array, position = sub_id·k + cell_id
    // (scattered through a map so codebook cells KMeans emptied leave
    // nulls — codes never name an empty cell, so null slots are dead)
    val lut = subspaces(dimsGuarded(queries, dims, vecCol), dims, m, qIdCol, vecCol)
      .join(broadcast(cents), "sub_id")
      .select(col(qIdCol),
        (col("sub_id") * k + col("cell_id")).as("__pos"),
        QuantizedKMeans.dist2(col("q"), col("c")).as("d2"))
      .groupBy(col(qIdCol))
      .agg(sort_array(collect_list(struct(col("__pos"), col("d2")))).as("__pd"))
      .withColumn("__pm", map_from_entries(col("__pd")))
      .select(col(qIdCol),
        transform(sequence(lit(0L), lit((m.toLong * k) - 1L)),
          i => element_at(col("__pm"), i)).as("__lut"))
    val adist = (0 until m).map { s =>
      element_at(col("__lut"),
        (element_at(col("__codes"), lit(s + 1)) + lit(s.toLong * k) + 1L).cast("int"))
    }.reduce(_ + _)
    codes.crossJoin(broadcast(lut))
      .select(col(qIdCol), col(idCol), adist.as("adist"))
      .groupBy(col(qIdCol))
      .agg(graft.topk.TopKAgg.min_k_long(col("adist"), col(idCol), topK).as("__top"))
      .select(col(qIdCol), explode(col("__top")).as("__pair"))
      .select(col(qIdCol), col("__pair.tag").as(idCol),
        col("__pair.dist").as("adist"))
  }
}

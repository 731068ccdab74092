package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Deterministic, integer-exact Lloyd's k-means over an embedding
  * column — the coarse-quantizer trainer (IVF cells, SemDeDup buckets,
  * k-means-sharded ANN) in a form where every decision is replayable
  * bit-for-bit in any engine.
  *
  * Three choices make it portable where float k-means is not
  * (cf. `IvfIndex.build`, which wraps Spark ML KMeans — seeded,
  * float-summed, and order-sensitive in its reduction):
  *  - coordinates quantize to integer micro-units (floor(x·10⁶), the
  *    em01 convention) BEFORE any arithmetic, so squared distances are
  *    exact BIGINTs (|x|≤10 ⇒ per-dim diff² ≤ 4·10¹⁴, ×64 dims
  *    ≤ 2.6·10¹⁶ — comfortably inside int64) and sums are
  *    order-independent across partitionings and engines;
  *  - initial centroids are the k lowest-id vectors (no seed, no
  *    sampling) — the classic reproducible-baseline init;
  *  - argmin ties break by cell id, and centroid updates use exact
  *    floor division ((s − pmod(s, n)) div n), so every assignment and
  *    every new coordinate is a total deterministic function of the
  *    input.
  *
  * Scale shape (the part ML KMeans also gets right, here made
  * explicit): centroids are k×dim — broadcast; ASSIGNMENT is row-local
  * (a broadcast nested loop over k per vector, no shuffle); UPDATE is
  * one partial-agg shuffle keyed by (cell, dim) whose output is
  * k×dim rows regardless of corpus size. Per iteration the corpus is
  * scanned once; the whole run is one lazy linear plan (each
  * iteration's frames are consumed exactly once — the pr01 rule:
  * nothing here is worth persisting).
  */
object QuantizedKMeans {

  /** Micro-unit quantization of one coordinate: floor(x·10⁶) as
    * BIGINT. float→double cast is exact; floor is deterministic. */
  def quant(x: Column): Column =
    floor(x.cast(DoubleType) * 1000000L).cast("long")

  /** (idCol, q: array<bigint>) — micro-unit quantization of `vecCol`. */
  def quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), transform(col(vecCol), x => quant(x)).as("q"))

  /** Exact squared L2 distance between two quantized vectors —
    * [[IntL2Expr]], the whole-stage-codegen kernel (identical integer
    * math to `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0L, _+_)`,
    * which it replaced: the interpreted HOF path measured ~2× slower
    * end-to-end on the PQ argmin joins). */
  def dist2(a: Column, b: Column): Column = IntL2Expr.l2(a, b)

  /** Train the codebook alone: `iters` Lloyd rounds, returns the final
    * (cell_id, c: array<bigint>) centroids frame — what an ADC lookup
    * table or a downstream encode pass consumes. */
  def centroids(df: DataFrame, k: Int, iters: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && iters >= 0, s"need k >= 1, iters >= 0; got $k, $iters")
    val q = quantize(df, idCol, vecCol)
    val initW = org.apache.spark.sql.expressions.Window.orderBy(col(idCol))
    // k lowest-id vectors; the k-row window is harmless (post-limit)
    var cents = q.orderBy(col(idCol)).limit(k)
      .withColumn("cell_id", (row_number().over(initW) - 1).cast("long"))
      .select(col("cell_id"), col("q").as("c"))
    // one Lloyd step: assign to nearest centroid (ties -> lowest cell),
    // then recompute each non-empty cell as the exact floor-div mean
    for (_ <- 1 to iters) {
      val assigned = q.crossJoin(broadcast(cents))
        .select(col(idCol), col("q"), col("cell_id"),
          dist2(col("q"), col("c")).as("d2"))
        .groupBy(col(idCol), col("q"))
        .agg(min(struct(col("d2"), col("cell_id"))).as("m"))
        .select(col(idCol), col("q"), col("m.cell_id").as("cell_id"))
      cents = assigned
        .select(col("cell_id"), posexplode(col("q")).as(Seq("i", "x")))
        .groupBy("cell_id", "i")
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .select(col("cell_id"), col("i"),
          expr("(s - pmod(s, n)) div n").as("v"))
        .groupBy("cell_id")
        .agg(sort_array(collect_list(struct(col("i"), col("v")))).as("sv"))
        .select(col("cell_id"),
          transform(col("sv"), s => s.getField("v")).as("c"))
    }
    cents
  }

  /** Exact quantized squared distance from every row of `df` to EVERY
    * centroid — (idCol, cell_id, d2), the ADC lookup-table shape.
    * Centroids broadcast; the cross join is k-bounded per row. */
  def distancesTo(df: DataFrame, cents: DataFrame,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    quantize(df, idCol, vecCol).crossJoin(broadcast(cents))
      .select(col(idCol), col("cell_id"), dist2(col("q"), col("c")).as("d2"))

  /** Argmin assignment of every row to its nearest centroid
    * (ties → lowest cell): (idCol, cell_id, d2). */
  def assignTo(df: DataFrame, cents: DataFrame,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    distancesTo(df, cents, idCol, vecCol)
      .groupBy(col(idCol))
      .agg(min(struct(col("d2"), col("cell_id"))).as("m"))
      .select(col(idCol), col("m.cell_id").as("cell_id"), col("m.d2").as("d2"))

  /** Run `iters` Lloyd iterations with k = `k`; returns the final
    * assignment (idCol, cell_id, d2) — the full per-vector mapping,
    * with the exact quantized squared distance to its centroid. */
  def run(df: DataFrame, k: Int, iters: Int,
          idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    assignTo(df, centroids(df, k, iters, idCol, vecCol), idCol, vecCol)
}

package graft.vector

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.FloatType

/** IVF (inverted-file) approximate nearest neighbor: a KMeans coarse
  * quantizer partitions the corpus into nList cells; a query scores only
  * the nProbe nearest cells instead of the whole corpus.
  *
  * Scale design: centroids are tiny (nList × dim) and broadcast; the
  * corpus is scanned ONCE at index build to assign cells (then persisted/
  * written partitioned by cell in a real deployment); query cost is
  * |corpus| · nProbe / nList per query batch. This is the standard IVF
  * flat index (cf. FAISS IVF-Flat) expressed as DataFrame ops: the cell
  * assignment is an argmin join against broadcast centroids, candidate
  * selection is a semi-join on cell id — all Catalyst-planned.
  */
object IvfIndex {

  final case class Index(cells: DataFrame, centroids: DataFrame)

  /** Build: KMeans on the (float→double) vectors, deterministic seed.
    * Returns the cell-assigned corpus and a centroids frame
    * (cell_id, centroid: array<float>).
    *
    * The quantizer trains on a CAPPED sample (trainCap vectors, file
    * order) with bounded Lloyd iterations — the standard IVF recipe
    * (FAISS trains on ~256 vectors/centroid): at corpus scale you never
    * iterate KMeans over all vectors; centroid quality converges on a
    * sample and the full corpus is touched exactly once, by the
    * assignment pass below. */
  def build(corpus: DataFrame, nList: Int,
            idCol: String = "vec_id", vecCol: String = "embedding",
            trainCapPerCell: Int = 256, maxIter: Int = 8): Index = {
    val withVec = corpus.withColumn("__features",
      array_to_vector(col(vecCol).cast("array<double>")))
    val train = withVec.select("__features").limit(trainCapPerCell * nList)
    if (train.isEmpty) {
      // empty corpus: no centroids, no cells — topK over this index is
      // correctly empty (KMeans.fit would throw on zero rows)
      val spark0 = corpus.sparkSession
      val centroids = spark0.createDataFrame(
        spark0.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("cell_id",
            org.apache.spark.sql.types.IntegerType, nullable = false),
          org.apache.spark.sql.types.StructField("centroid",
            org.apache.spark.sql.types.ArrayType(FloatType, containsNull = false)))))
      return Index(
        corpus.select(col(idCol), col(vecCol)).withColumn("cell_id", lit(0)),
        centroids)
    }
    val model = new KMeans().setK(nList).setSeed(42L).setMaxIter(maxIter)
      .setFeaturesCol("__features").setPredictionCol("cell_id")
      .fit(train)
    val cells = model.transform(withVec)
      .select(col(idCol), col(vecCol), col("cell_id"))
      .transform(org.apache.spark.sql.graftbridge.GraftSqlBridge.sharedInPlan)
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat).toSeq) }
      .toSeq.toDF("cell_id", "centroid")
      .withColumn("centroid", col("centroid").cast(s"array<float>"))
    Index(cells, centroids)
  }

  /** Persist: cells written PARTITIONED BY cell_id (a probe reads only
    * its cells' files — partition pruning does the IVF candidate
    * narrowing at the storage layer), centroids as a single small
    * parquet. This is the deployment shape: build once, serve many
    * query batches from disk. */
  def save(index: Index, path: String): Unit = {
    index.cells.write.mode("overwrite")
      .partitionBy("cell_id").parquet(s"$path/cells")
    index.centroids.write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Load a saved index. Cell scans prune by cell_id at the source. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Index =
    Index(
      cells = spark.read.parquet(s"$path/cells"),
      centroids = spark.read.parquet(s"$path/centroids"))

  /** The probe-selection half of [[topK]]: per query, the nProbe
    * nearest cells by centroid cosine — (query_id, q_vec, q_norm,
    * cell_id) rows, queries×nProbe of them. Exposed so audit tooling
    * (graft.SkewProbe) can count candidate rows with the library's own
    * selection instead of a re-derivation. */
  private[graft] def probedCells(index: Index, queries: DataFrame, nProbe: Int,
                                 idCol: String = "vec_id",
                                 vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      VectorFunctions.normSq(col(vecCol)).as("q_norm"))
    // rank cells per query against broadcast centroids
    val cellSim = VectorFunctions.cosine(col("q_vec"), col("centroid"))
    val wCell = Window.partitionBy("query_id").orderBy(col("cell_sim").desc, col("cell_id"))
    q.crossJoin(broadcast(index.centroids))
      .withColumn("cell_sim", cellSim)
      .withColumn("cell_rank", row_number().over(wCell))
      .filter(col("cell_rank") <= nProbe)
      .select("query_id", "q_vec", "q_norm", "cell_id")
  }

  /** Query: per query vector, pick the nProbe nearest cells by centroid
    * cosine, then exact-score only vectors in those cells. */
  def topK(index: Index, queries: DataFrame, k: Int, nProbe: Int,
           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val probed = probedCells(index, queries, nProbe, idCol, vecCol)
    // candidates = corpus vectors in probed cells
    val c = index.cells.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("c_vec"), col("cell_id"),
      VectorFunctions.normSq(col(vecCol)).as("c_norm"))
    // probed is queries×nProbe rows (tiny) — broadcast it so the
    // candidate join streams the corpus in place; the equi-join key
    // has only nList distinct values, so a shuffled join would hash
    // the whole corpus into nList-way-skewed partitions
    val scored = broadcast(probed).join(c, Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim_r", round(VectorFunctions.cosinePrenormed(
        VectorFunctions.dot(col("q_vec"), col("c_vec")),
        col("q_norm"), col("c_norm")), 6))
    // per-query top-k as the map-side heap (TopKAgg: sim DESC, id ASC —
    // the same selection as the rank<=k window it replaced, without
    // sorting the scored stream: at all-probe (nn06) that stream is
    // queries×corpus, and the windowed sort spilled at sf10)
    scored.groupBy("query_id")
      .agg(graft.topk.TopKAgg.top_k(col("sim_r"), col("neighbor_id"), k).as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__pos", "__pair")))
      .select(col("query_id"), (col("__pos") + 1).as("rank"),
        col("__pair.tag").as("neighbor_id"), col("__pair.value").as("sim_r"))
  }
}

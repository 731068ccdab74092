package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-replica builder (developer tool, the SCALE.md measurement
  * apparatus): synthesizes an sfN directory from a driver-generated
  * sf directory by key-shifted `factor`× self-union — the standard way
  * to add a measured decade to the scaling curve when the upstream
  * generator isn't available at the target SF.
  *
  * `runMain graft.ScaleUp <srcDir> <destDir> [factor=10]`
  *
  * Replica discipline (what makes the result a legitimate SCALING
  * corpus rather than a degenerate one):
  *  - FACT/DIM keys shift by replica i × a round offset above the
  *    source max, consistently across every table that joins on them
  *    (custkey, orderkey, partkey, suppkey, event_id, user_id, doc_id,
  *    vec_id) — join fan-outs and group cardinalities scale the way a
  *    real bigger corpus would. region/nation stay fixed (TPC-H
  *    semantics: dimensions don't grow with SF).
  *  - DOCUMENT text gets a deterministic per-replica token-prefix
  *    substitution (every 5th token, offset by replica) so replicas of
  *    the same document sit BELOW the near-dup thresholds (token-set
  *    Jaccard ≈ 0.67 < 4/5 between any two replicas): without this,
  *    every doc would acquire 9 synthetic near-duplicates and the
  *    output-bound dedup families would measure the replication
  *    artifact, not scaling. n_chars is recomputed.
  *  - EMBEDDINGS rotate their coordinates by replica (a permutation of
  *    an isotropic vector is equally distributed; cosine between a
  *    vector and its rotation is ≈ 0): intra-replica similarity
  *    structure is preserved exactly, cross-replica pairs look like
  *    fresh random vectors — a 10× ANN corpus, not 10 copies.
  *  - Everything else (timestamps, values, statuses) replicates
  *    verbatim: the value distributions ARE the workload.
  */
object ScaleUp {

  // round offsets comfortably above every source max key
  private val C = 1000000L   // custkey
  private val O = 10000000L  // orderkey
  private val P = 1000000L   // partkey
  private val S = 100000L    // suppkey
  private val E = 10000000L  // event_id
  private val U = 100000L    // user_id
  private val D = 1000000L   // doc_id
  private val V = 100000L    // vec_id

  private def replicate(src: DataFrame, factor: Int)
                       (mod: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until factor).map(i => mod(src, i)).reduce(_.unionByName(_))

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleUp <srcDir> <destDir> [factor]")
    val (srcDir, destDir) = (args(0), args(1))
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String) = spark.read.parquet(s"$srcDir/$t.parquet")
    def write(df: DataFrame, t: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$destDir/$t.parquet")

    def shift(df: DataFrame, i: Int, shifts: (String, Long)*): DataFrame =
      shifts.foldLeft(df) { case (d, (c, off)) =>
        d.withColumn(c, col(c) + lit(i * off)) }

    // dimensions: fixed, verbatim
    write(read("region"), "region", 1)
    write(read("nation"), "nation", 1)

    write(replicate(read("customer"), factor)(shift(_, _, "c_custkey" -> C)),
      "customer", 4)
    write(replicate(read("supplier"), factor)(shift(_, _, "s_suppkey" -> S)),
      "supplier", 1)
    write(replicate(read("part"), factor)(shift(_, _, "p_partkey" -> P)),
      "part", 2)
    write(replicate(read("orders"), factor)(
      shift(_, _, "o_orderkey" -> O, "o_custkey" -> C)), "orders", 8)
    write(replicate(read("lineitem"), factor)(
      shift(_, _, "l_orderkey" -> O, "l_partkey" -> P, "l_suppkey" -> S)),
      "lineitem", 16)
    write(replicate(read("events"), factor)(
      shift(_, _, "event_id" -> E, "user_id" -> U)), "events", 8)

    // documents: shift doc_id; per-replica token-prefix substitution
    // (replica 0 verbatim) keeps cross-replica Jaccard under the
    // near-dup thresholds; n_chars recomputed from the new text
    write(replicate(read("documents"), factor) { (df, i) =>
      val tagged =
        if (i == 0) df
        else df.withColumn("text",
          array_join(
            // positions idx % 5 == i % 5 get a replica prefix: any two
            // replicas differ on >= 1/5 of tokens (different positions
            // or different tags), dropping token-set Jaccard to ~0.67
            transform(split(col("text"), " "),
              (t, idx) => when(idx % 5 === lit(i % 5),
                concat(lit(s"zr$i"), t)).otherwise(t)),
            " "))
          .withColumn("n_chars", length(col("text")))
      shift(tagged, i, "doc_id" -> D)
    }, "documents", 8)

    // embeddings: shift vec_id; rotate coordinates by replica (i*7 mod
    // dim, coprime-ish stride so all replicas rotate differently)
    write(replicate(read("embeddings"), factor) { (df, i) =>
      val rotated =
        if (i == 0) df
        else df.withColumn("embedding", {
          val n = size(col("embedding"))
          transform(col("embedding"),
            (_, idx) => element_at(col("embedding"),
              (pmod(idx + lit(i * 7), n) + lit(1)).cast("int")))
        })
      shift(rotated, i, "vec_id" -> V)
    }, "embeddings", 4)

    println(s"""{"scaleup":"done","src":"$srcDir","dest":"$destDir","factor":$factor}""")
    spark.stop()
  }
}

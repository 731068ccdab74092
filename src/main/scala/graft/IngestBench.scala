package graft

import graft.warehouse.{HhsPipeline, Schemas}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest throughput benchmark: synthesizes an HHS-shaped CSV from the
  * testdata (same row count as lineitem at each chosen sf), runs the
  * full HhsPipeline (clean → validate → dedup → 3-table projection),
  * and prints rows/sec — at EVERY dir passed, with decade exponents
  * between consecutive points (r15, VERDICT r14 #8: the reference-
  * parity path gets the same decade discipline as the query suite;
  * sf0.01 → sf0.1 → corpora/sf1 is a two-decade ladder on input rows).
  *
  * Context (BASELINE.md): the reference ingests with up to 6 network
  * round-trips PER ROW (load_hhs.py:75-137). This pipeline is one Spark
  * job per file; at 5,000 rows/week the reference is bounded by
  * round-trip latency (~minutes), this by scan+shuffle throughput.
  *
  * Not driver-run; usage:
  *   sbt "runMain graft.IngestBench [sfDir ...]"
  * (default: the two-decade ladder above). Env: SPARK_GRAFT_ITERS
  * (default 2; each point reports the min), SPARK_GRAFT_CPUS.
  * Results append to bench/ingest_history.jsonl (NOT history.jsonl —
  * the query-suite tooling keys on sf basename and must not see
  * ingest lines).
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1",
               "/root/repo/corpora/sf1")
    // fail fast BEFORE any history line is appended: the default ladder
    // includes corpora/sf1 (a ScaleUp artifact), and crashing mid-run on
    // a fresh checkout used to leave a partial ladder in the committed
    // history (ADVICE r15)
    val missing = dirs.filterNot(d => java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(d)))
    require(missing.isEmpty,
      s"missing input dir(s): ${missing.mkString(", ")} — run graft.ScaleUp " +
        "first (corpora/sfN dirs are built artifacts, not checked in)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val points = dirs.map { sfDir =>
      // synthesize an HHS-shaped CSV: one hospital row per lineitem row,
      // ~5% invalid metrics, 2% sentinels, duplicate keys every 100 rows
      val csvDir = "target/ingest_bench_csv"
      Tables.lineitem(spark, sfDir).select(
        concat(lit("H"), (col("l_orderkey") / 100).cast("long")).as("hospital_pk"),
        concat(lit("Hospital "), col("l_orderkey")).as("hospital_name"),
        lit("PA").as("state"), lit("1 Main St").as("address"),
        lit("Pittsburgh").as("city"), lit("15213").as("zip"),
        lit("42003").as("fips_code"), lit("POINT (-79 40)").as("geocoded_hospital_address"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("collection_week"),
        when(col("l_linenumber") === 7, lit("-2.0"))          // rejects
          .when(col("l_linenumber") === 6, lit("-999999"))    // sentinel → null
          .otherwise(col("l_quantity").cast("string")).as("m1"),
        col("l_quantity").cast("string").as("m2"), col("l_quantity").cast("string").as("m3"),
        col("l_quantity").cast("string").as("m4"), col("l_quantity").cast("string").as("m5"),
        col("l_quantity").cast("string").as("m6"), col("l_quantity").cast("string").as("m7"),
        col("l_quantity").cast("string").as("m8"))
        .toDF(Schemas.hhsRawCsv.fieldNames.toIndexedSeq: _*)
        .write.mode("overwrite").option("header", "true").csv(csvDir)

      val emptyH = spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], Schemas.hospitals)
      val emptyB = spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], Schemas.hospitalBedInformation)

      var best = Double.MaxValue
      var counts = (0L, 0L, 0L)
      for (_ <- 1 to iters) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val r = HhsPipeline.load(spark, csvDir, emptyH, emptyB)
        counts = (r.hospitals.count(), r.bedInfo.count(), r.rejects.count())
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      val (nHosp, nBeds, nRej) = counts
      val inputRows = spark.read.option("header", "true").csv(csvDir).count()
      // cpus in the line: rows/s from different local[N] configs are
      // different populations — see the calib-stamp convention.
      val line = f"""{"metric":"ingest_rows_per_sec","value":${inputRows / best}%.0f,"input_rows":$inputRows,"hospitals":$nHosp,"bed_rows":$nBeds,"rejects":$nRej,"sec":$best%.2f,"iters":$iters,"cpus":$cpus,"ts":"${java.time.Instant.now()}","src":"$sfDir"}"""
      println(line)
      try {
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get("bench"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get("bench/ingest_history.jsonl"), line + "\n",
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
      } catch { case e: Throwable =>
        System.err.println(s"[ingest-bench] history append failed: ${e.getMessage}")
      }
      (sfDir, inputRows, best)
    }
    // decade exponents between consecutive points, scaled by actual
    // input-row ratio (corpora factors aren't exactly 10×)
    points.sliding(2).foreach {
      case Seq((dA, rA, tA), (dB, rB, tB)) if rA > 0 && tA > 0 =>
        val decades = math.log10(rB.toDouble / rA)
        if (decades > 0.1) {
          val e = math.log10(tB / tA) / decades
          println(f"""{"metric":"ingest_decade_exponent","value":$e%.2f,"from":"$dA","to":"$dB","row_ratio":${rB.toDouble / rA}%.1f}""")
        }
      case _ => ()
    }
    spark.stop()
  }
}

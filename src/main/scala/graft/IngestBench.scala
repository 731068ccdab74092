package graft

import graft.warehouse.{HhsPipeline, Schemas}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest throughput benchmark: synthesizes an HHS-shaped CSV from the
  * testdata (same row count as lineitem at the chosen sf), runs the
  * full HhsPipeline (clean → validate → dedup → 3-table projection),
  * and prints rows/sec.
  *
  * Context (BASELINE.md): the reference ingests with up to 6 network
  * round-trips PER ROW (load_hhs.py:75-137). This pipeline is one Spark
  * job per file; at 5,000 rows/week the reference is bounded by
  * round-trip latency (~minutes), this by scan+shuffle throughput.
  * Not driver-run; usage: sbt "runMain graft.IngestBench [sfDir]".
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

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

    val t0 = System.nanoTime()
    val r = HhsPipeline.load(spark, csvDir, emptyH, emptyB)
    val (nHosp, nBeds, nRej) = (r.hospitals.count(), r.bedInfo.count(), r.rejects.count())
    val secs = (System.nanoTime() - t0) / 1e9
    val inputRows = spark.read.option("header", "true").csv(csvDir).count()
    println(f"""{"metric":"ingest_rows_per_sec","value":${inputRows / secs}%.0f,"input_rows":$inputRows,"hospitals":$nHosp,"bed_rows":$nBeds,"rejects":$nRej,"sec":$secs%.2f}""")
    spark.stop()
  }
}

package graft.warehouse

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** End-to-end ingest fixtures (FIXTURES.md §A): reference-shaped CSVs
  * through the HHS and Quality pipelines, exercising every fidelity trap
  * from SURVEY §7.4 (sentinel, (−1,0) truncation pass, within-file
  * first-wins, cross-load dedup, Not Available recode, Yes/No booleans). */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val dir = Files.createTempDirectory(
    Paths.get("/root/repo/target"), "fixtures").toString

  private def writeCsv(name: String, content: String): String = {
    val p = s"$dir/$name"
    Files.writeString(Paths.get(p), content)
    p
  }

  private val hhsHeader = (Schemas.hhsRawCsv.fieldNames).mkString(",")
  private def hhsRow(pk: String, name: String, week: String, beds: String) =
    s"$pk,$name,PA,1 Main St,Pittsburgh,15213,42003,POINT (-79 40),$week," +
      (Seq.fill(8)(beds).mkString(","))

  test("HHS load: clean, validate (truncation quirk), dedup, project 3 tables") {
    val csv = writeCsv("hhs.csv", Seq(
      hhsHeader,
      hhsRow("A", "Alpha", "2023-01-06", "10.5"),
      hhsRow("A", "Alpha Dup", "2023-01-06", "11.0"),   // within-file dup (first wins)
      hhsRow("B", "Beta", "2023-01-06", "-0.5"),        // (-1,0) → VALID (int() quirk)
      hhsRow("C", "Gamma", "2023-01-06", "-2.0"),       // negative → reject
      hhsRow("D", "", "2023-01-06", "5.0"),             // empty name → null → reject
      hhsRow("E", "Eps", "2023-01-06", "-999999")       // sentinel → null → valid
    ).mkString("\n"))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.hospitals)
    val emptyBeds = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.hospitalBedInformation)
    val r = HhsPipeline.load(spark, csv, empty, emptyBeds)
    assert(r.hospitals.select("hospital_pk").as[String].collect().sorted.toSeq ==
      Seq("A", "B", "E"))
    assert(r.hospitals.filter($"hospital_pk" === "A")
      .select("hospital_name").as[String].head() == "Alpha") // first occurrence won
    assert(r.bedInfo.filter($"hospital_fk" === "E")
      .select("total_icu_beds_7_day_avg").as[Option[Double]].head().isEmpty) // sentinel→null
    val reasons = r.rejects.select("hospital_pk", "reject_reason")
      .as[(String, String)].collect().toMap
    assert(reasons("C").startsWith("negative_"))
    assert(reasons("D") == "hospital_name_null")
    // cross-load dedup: re-loading the same file adds nothing
    val r2 = HhsPipeline.load(spark, csv, r.hospitals, r.bedInfo)
    assert(r2.hospitals.count() == 0 && r2.bedInfo.count() == 0)
  }

  test("Quality load: recode, booleans, literal date, same-date dedup") {
    val csv = writeCsv("quality.csv", Seq(
      """Facility ID,Hospital Type,Hospital Ownership,Emergency Services,Hospital overall rating""",
      """F1,Acute Care,Proprietary,Yes,4""",
      """F2,Acute Care,Government - Federal,No,Not Available""",
      """F3,Critical Access,Voluntary,Yes,2"""
    ).mkString("\n"))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.hospitalQualityInformation)
    val r = QualityPipeline.load(spark, csv, "2023-07-01", empty)
    val byId = r.quality.collect().map(x => x.getString(0) -> x).toMap
    assert(r.quality.count() == 3)
    assert(byId("F2").getDouble(1) == 0.0)          // 'Not Available' → 0
    assert(byId("F1").getBoolean(2))                 // Yes → true
    assert(!byId("F2").getBoolean(2))                // No → false
    assert(byId("F3").getDate(5).toString == "2023-07-01")
    // same-date re-load: all duplicates
    val r2 = QualityPipeline.load(spark, csv, "2023-07-01", r.quality)
    assert(r2.quality.count() == 0)
    assert(r2.rejects.filter($"reject_reason" === "duplicate").count() == 3)
    // different date: fresh snapshot accepted
    val r3 = QualityPipeline.load(spark, csv, "2023-10-01", r.quality)
    assert(r3.quality.count() == 3)
  }

  test("Reports run end-to-end over loaded warehouse tables") {
    val csv = writeCsv("hhs2.csv", Seq(
      hhsHeader,
      hhsRow("A", "Alpha", "2023-01-06", "10.0"),
      hhsRow("B", "Beta", "2023-01-06", "20.0"),
      hhsRow("A", "Alpha", "2023-01-13", "12.0")
    ).mkString("\n"))
    val qcsv = writeCsv("quality2.csv", Seq(
      """Facility ID,Hospital Type,Hospital Ownership,Emergency Services,Hospital overall rating""",
      """A,Acute Care,Proprietary,Yes,4""",
      """B,Acute Care,Proprietary,Yes,2"""
    ).mkString("\n"))
    val eH = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.hospitals)
    val eB = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.hospitalBedInformation)
    val eQ = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.hospitalQualityInformation)
    val h = HhsPipeline.load(spark, csv, eH, eB)
    val q = QualityPipeline.load(spark, qcsv, "2023-07-01", eQ)

    assert(Reports.recordsForWeek(h.bedInfo, "2023-01-06").as[Long].head() == 2L)
    assert(Reports.recordsByWeek(h.bedInfo).count() == 2)
    assert(Reports.bedSumsForWeek(h.bedInfo, "2023-01-06")
      .select("sum_total_icu_beds_7_day_avg").as[Double].head() == 30.0)
    val frac = Reports.bedUseByRating(q.quality, h.bedInfo)
    assert(frac.count() == 2) // ratings 4 and 2
    assert(Reports.emergencyHospitalsByState(q.quality, h.hospitals, h.locations, "2023-07-01")
      .select("n_hospitals").as[Long].head() == 2L)
    assert(Reports.ratingByStateTopBottom(q.quality, h.locations, "2023-07-01").count() == 1)
    assert(Reports.casesByWeek(h.bedInfo, "2023-01-13").count() == 2)
    assert(Reports.bedUseByOwnership(q.quality, h.bedInfo, "Proprietary").count() == 2)
  }

  test("CLI loaders: end-to-end shell workflow writes warehouse dirs + reject CSVs") {
    import graft.cli.Cli
    val csv = writeCsv("cli_hhs.csv", Seq(
      hhsHeader,
      hhsRow("A", "Alpha", "2023-01-06", "10.0"),
      hhsRow("B", "", "2023-01-06", "5.0")              // reject → CSV sink
    ).mkString("\n"))
    val qcsv = writeCsv("cli_quality.csv", Seq(
      """Facility ID,Hospital Type,Hospital Ownership,Emergency Services,Hospital overall rating""",
      """A,Acute Care,Proprietary,Yes,4"""
    ).mkString("\n"))
    val wh = s"$dir/cli_warehouse"
    val rej = s"$dir/cli_rejects"

    Cli.runHhs(spark, csv, wh, rej)
    Cli.runQuality(spark, "2023-07-01", qcsv, wh, rej)
    for (t <- Seq("hospitals", "hospital_locations", "hospital_bed_information",
                  "hospital_quality_information"))
      assert(Files.exists(Paths.get(s"$wh/$t")), s"missing warehouse dir $t")
    assert(spark.read.parquet(s"$wh/hospitals").count() == 1)
    assert(spark.read.option("header", "true").csv(s"$rej/hhs")
      .filter($"reject_reason" === "hospital_name_null").count() == 1)

    // second load against the ON-DISK warehouse: cross-load dedup holds
    Cli.runHhs(spark, csv, wh, rej)
    assert(spark.read.parquet(s"$wh/hospitals").count() == 1)
    assert(spark.read.parquet(s"$wh/hospital_bed_information").count() == 1)
  }
}

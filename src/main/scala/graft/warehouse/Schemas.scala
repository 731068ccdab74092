package graft.warehouse

import org.apache.spark.sql.types._

/** Explicit StructTypes for the warehouse tables and raw ingest CSVs
  * (reference: design_table_schema.ipynb cells 0-3; FIXTURES.md §A/§B).
  * Never `inferSchema` in production paths — the reference's pandas
  * inference is a correctness hazard it works around by re-reading with
  * dtype=object (load_hhs.py:154).
  */
object Schemas {

  val hhsMetricColumns: Seq[String] = Seq(
    "all_adult_hospital_beds_7_day_avg",
    "all_pediatric_inpatient_beds_7_day_avg",
    "all_adult_hospital_inpatient_bed_occupied_7_day_coverage",
    "all_pediatric_inpatient_bed_occupied_7_day_avg",
    "total_icu_beds_7_day_avg",
    "icu_beds_used_7_day_avg",
    "inpatient_beds_used_covid_7_day_avg",
    "staffed_icu_adult_patients_confirmed_covid_7_day_avg")

  /** Raw HHS weekly CSV — everything string at scan; cleaning casts
    * (reference: load_hhs.py:46 reads inferred; we scan string-preserving
    * so the reject sink can emit original text, load_hhs.py:153-155). */
  val hhsRawCsv: StructType = StructType(
    Seq("hospital_pk", "hospital_name", "state", "address", "city", "zip",
      "fips_code", "geocoded_hospital_address", "collection_week")
      .map(StructField(_, StringType)) ++
      hhsMetricColumns.map(StructField(_, StringType)))

  /** Raw CMS quality CSV — original headers with spaces/capitals
    * (reference: load_quality.py:98). */
  val qualityRawCsv: StructType = StructType(Seq(
    StructField("Facility ID", StringType),
    StructField("Hospital Type", StringType),
    StructField("Hospital Ownership", StringType),
    StructField("Emergency Services", StringType),
    StructField("Hospital overall rating", StringType)))

  val hospitals: StructType = StructType(Seq(
    StructField("hospital_pk", StringType, nullable = false),
    StructField("hospital_name", StringType, nullable = false)))

  val hospitalLocations: StructType = StructType(Seq(
    StructField("hospital_fk", StringType, nullable = false),
    StructField("state", StringType),
    StructField("address", StringType),
    StructField("city", StringType),
    StructField("zip", StringType),
    StructField("fips_code", StringType),
    StructField("geocoded_hospital_address", StringType)))

  val hospitalBedInformation: StructType = StructType(
    Seq(StructField("hospital_fk", StringType, nullable = false),
      StructField("collection_week", DateType, nullable = false)) ++
      hhsMetricColumns.map(StructField(_, DoubleType)))

  val hospitalQualityInformation: StructType = StructType(Seq(
    StructField("facility_id", StringType, nullable = false),
    StructField("hospital_overall_rating", DoubleType),
    StructField("emergency_services", BooleanType),
    StructField("hospital_type", StringType),
    StructField("hospital_ownership", StringType),
    StructField("data_date", DateType, nullable = false)))
}

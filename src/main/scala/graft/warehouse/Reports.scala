package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference dashboard's 7 analytics queries (Reporting.py:27-263) as
  * DataFrame pipelines over the warehouse tables. Each stays fully
  * distributed — the driver collects only display-sized results, unlike
  * the reference which fetchall()s every result into pandas.
  *
  * Scale notes: dimension joins (hospitals, locations) auto-broadcast;
  * fact-side filters on collection_week / data_date hit parquet partition
  * pruning because the pipelines write partitioned by those columns.
  */
object Reports {

  private val bedCols5 = Seq(
    "all_adult_hospital_beds_7_day_avg",
    "all_pediatric_inpatient_beds_7_day_avg",
    "total_icu_beds_7_day_avg",
    "icu_beds_used_7_day_avg",
    "inpatient_beds_used_covid_7_day_avg")

  private def inUse: Column =
    col("all_adult_hospital_inpatient_bed_occupied_7_day_coverage") +
      col("all_pediatric_inpatient_bed_occupied_7_day_avg")

  private def available: Column =
    col("all_adult_hospital_beds_7_day_avg") +
      col("all_pediatric_inpatient_beds_7_day_avg")

  /** R1 — A1: record count for the selected week (Reporting.py:29-33). */
  def recordsForWeek(bedInfo: DataFrame, week: String): DataFrame =
    bedInfo.filter(col("collection_week") === lit(week))
      .agg(count(lit(1)).as("n_records"))

  /** R2 — A2/T1: records per week, ordered (Reporting.py:36-41). */
  def recordsByWeek(bedInfo: DataFrame): DataFrame =
    bedInfo.groupBy("collection_week").agg(count(lit(1)).as("n_records"))
      .orderBy("collection_week")

  private def bedSumAggs: Seq[Column] =
    bedCols5.map(c => round(sum(col(c)), 2).as(s"sum_$c"))

  /** R3 — A3/P12: 5 bed-metric sums for one week (Reporting.py:59-67). */
  def bedSumsForWeek(bedInfo: DataFrame, week: String): DataFrame =
    bedInfo.filter(col("collection_week") === lit(week))
      .agg(bedSumAggs.head, bedSumAggs.tail: _*)

  /** R4 — A4/T2: same sums for the 4 most recent weeks <= `week`, then
    * re-sorted ascending (Reporting.py:84-106). TakeOrderedAndProject =
    * true top-k, no full sort. */
  def bedSumsRecentWeeks(bedInfo: DataFrame, week: String, k: Int = 4): DataFrame =
    bedInfo.filter(col("collection_week") <= lit(week))
      .groupBy("collection_week")
      .agg(bedSumAggs.head, bedSumAggs.tail: _*)
      .orderBy(col("collection_week").desc).limit(k)
      .orderBy(col("collection_week"))

  /** R5 — J1/A5: fraction of beds in use by quality rating
    * (Reporting.py:109-135). Deliberately NO date alignment in the join —
    * reference fidelity (SURVEY §7.4.5). Null on zero denominator
    * (Postgres would error; documented divergence). */
  def bedUseByRating(quality: DataFrame, bedInfo: DataFrame): DataFrame =
    quality.join(bedInfo, quality("facility_id") === bedInfo("hospital_fk"))
      .groupBy("hospital_overall_rating")
      .agg((sum(inUse) / when(sum(available) =!= 0d, sum(available)))
        .as("fraction_of_beds_in_use"))
      .orderBy("hospital_overall_rating")

  /** R6 — A6/P11: all cases vs covid cases per week (Reporting.py:144-153). */
  def casesByWeek(bedInfo: DataFrame, week: String): DataFrame =
    bedInfo.filter(col("collection_week") <= lit(week))
      .groupBy("collection_week")
      .agg(
        sum(col("all_adult_hospital_inpatient_bed_occupied_7_day_coverage") +
          col("all_pediatric_inpatient_bed_occupied_7_day_avg") +
          col("icu_beds_used_7_day_avg")).as("all_cases"),
        sum(col("inpatient_beds_used_covid_7_day_avg")).as("covid_cases"))
      .orderBy("collection_week")

  /** R7 — J2/A7/T3: emergency-service hospitals per state, top 20
    * (Reporting.py:180-196). Dim joins broadcast. */
  def emergencyHospitalsByState(quality: DataFrame, hospitals: DataFrame,
                                locations: DataFrame, dataDate: String): DataFrame =
    quality.filter(col("data_date") === lit(dataDate) && col("emergency_services"))
      .join(hospitals, quality("facility_id") === hospitals("hospital_pk"))
      .join(locations, hospitals("hospital_pk") === locations("hospital_fk"))
      .groupBy("state").agg(count(lit(1)).as("n_hospitals"))
      .orderBy(col("n_hospitals").desc, col("state")).limit(20)

  /** R8 — J4/A8: bed-use fraction by ownership over weeks
    * (Reporting.py:200-224). */
  def bedUseByOwnership(quality: DataFrame, bedInfo: DataFrame, ownership: String): DataFrame =
    quality.filter(col("hospital_ownership") === lit(ownership))
      .join(bedInfo, quality("facility_id") === bedInfo("hospital_fk"))
      .groupBy("hospital_ownership", "collection_week")
      .agg((sum(inUse) / when(sum(available) =!= 0d, sum(available)))
        .as("fraction_in_use"))
      .orderBy("collection_week")

  /** R9 — A9/T4/V6: mean rating per state, top-10 + bottom-10
    * (Reporting.py:240-263). */
  def ratingByStateTopBottom(quality: DataFrame, locations: DataFrame,
                             dataDate: String, k: Int = 10): DataFrame = {
    val avgByState = quality.filter(col("data_date") === lit(dataDate))
      .join(locations, quality("facility_id") === locations("hospital_fk"))
      .na.drop(Seq("state", "hospital_overall_rating"))
      .groupBy("state").agg(avg("hospital_overall_rating").as("avg_rating"))
    val top = avgByState.orderBy(col("avg_rating").desc, col("state")).limit(k)
    val bottom = avgByState.orderBy(col("avg_rating").asc, col("state")).limit(k)
    top.unionByName(bottom).distinct().orderBy(col("avg_rating").desc, col("state"))
  }
}

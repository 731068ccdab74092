package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver's synthetic testdata corpus (TESTDATA.md).
  *
  * Scale notes (100 TB design): every loader is a plain parquet scan —
  * Catalyst pushes column pruning and predicate filters into the scan
  * (`PushedFilters` / `ReadSchema`), so downstream operators decide I/O,
  * not this module. No DATA caching here: at 100 TB, caching a full
  * table is a mistake; callers cache only small dimension frames they
  * broadcast. The analyzed-relation METADATA (file listing + parquet
  * footer schema) IS memoized per (session, path): that's what a
  * catalog/metastore provides in production, and re-listing per query
  * was a measurable fixed cost across an 89-query run.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val relationCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private val hooked = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** Memoized relation per (session, path). Entries for a session are
    * evicted when its SparkContext ends (a listener registered on first
    * use), so stopped sessions and their plans are never pinned across
    * suites. Paths are assumed immutable within a session (parquet file
    * listing is captured at first read — a metastore's contract); after
    * overwriting files at a cached path, call [[invalidate]]. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (hooked.add(spark))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            end: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
          evict(spark)
      })
    relationCache.computeIfAbsent((spark, s"$sfDir/$name.parquet"),
      key => key._1.read.parquet(key._2))
  }

  /** Drop every memoized relation for `spark` (e.g. testdata rewritten).
    * Deliberately does NOT un-hook the session: a live session keeps its
    * one registered listener (removing it here made each
    * invalidate→table cycle register a fresh identical listener — a
    * leak, since addSparkListener has no dedup). */
  def invalidate(spark: SparkSession): Unit =
    relationCache.keySet.removeIf(_._1 eq spark)

  /** Full eviction when the session's context ends (listener path). */
  private def evict(spark: SparkSession): Unit = {
    hooked.remove(spark)
    relationCache.keySet.removeIf(_._1 eq spark)
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts normalizes to a session-TZ TIMESTAMP whatever the
    * driver generated, which has varied across testdata generations:
    *  - parquet timestamp[ns] + spark.sql.legacy.parquet.nanosAsLong
    *    ⇒ LongType; restore via integer ns→µs division (exact, and
    *    identical to DuckDB's TIMESTAMP_NS truncation);
    *  - parquet timestamp[us] with isAdjustedToUTC=false ⇒ Spark 4
    *    infers TIMESTAMP_NTZ; cast to TIMESTAMP — value-preserving
    *    because every graft session pins the UTC session timezone,
    *    and it matches DuckDB, which reads the same file as its naive
    *    TIMESTAMP;
    *  - already TIMESTAMP ⇒ pass through.
    * Downstream operators therefore always see one ts type, and
    * unix_micros/watermarks/event-time windows keep working across
    * testdata regenerations. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // the NTZ→TIMESTAMP cast reinterprets the wall-clock value in
        // the SESSION timezone; it is value-preserving (and DuckDB-
        // matching) only under UTC, so fail fast rather than silently
        // shift every event time for a non-UTC caller
        val tz = s.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"events() requires spark.sql.session.timeZone=UTC (got '$tz'): " +
          "the TIMESTAMP_NTZ->TIMESTAMP cast is timezone-sensitive")
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

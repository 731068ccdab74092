package graft

import org.apache.spark.sql.SparkSession

/** The library's front door: a SparkSession pre-configured the way
  * every graft operator expects, so adopting the engine is one call
  * rather than a checklist.
  *
  *  - native expressions registered for SQL ([[GraftExtensions]]:
  *    vec_dot, minhashes, shingle_hashes, simhash64,
  *    unicode_normalize, jaro_winkler)
  *  - UTC session timezone (oracle-portable date/time arithmetic)
  *  - nanosecond-parquet timestamps readable
  *    (`spark.sql.legacy.parquet.nanosAsLong`; `Tables.events`
  *    restores the timestamp type)
  *  - AQE left ON (skew-join and runtime re-planning; every operator
  *    here is order-independent by construction, so re-planning is
  *    always safe)
  *
  * `configure` composes with an existing builder for cluster
  * deployments (master/memory/shuffle-partitions stay the caller's
  * choice there); `local(cpus)` is the single-JVM form the tests,
  * Verify, and Bench mains use, with shuffle parallelism matched to
  * the core count rather than the 200-partition default.
  */
object GraftSession {

  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .withExtensions(new GraftExtensions)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def local(cpus: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    // getOrCreate may hand back a pre-existing session, whose builder
    // configs were ignored — (re-)apply the runtime-settable pieces so
    // the contract holds either way (function registration is
    // overwrite-idempotent)
    GraftExtensions.install(s)
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s
  }
}

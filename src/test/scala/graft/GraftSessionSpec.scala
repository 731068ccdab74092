package graft

class GraftSessionSpec extends SparkSpec {

  test("local() delivers the configured contract even over a reused session") {
    val s = GraftSession.local(4)
    // SQL surface registered
    val jw = s.sql("SELECT jaro_winkler('martha', 'marhta') AS v")
      .head().getDouble(0)
    assert(math.abs(jw - 0.9611111111111111) < 1e-9)
    assert(s.sql("SELECT simhash64(array(CAST(5 AS BIGINT))) AS v")
      .head().getLong(0) == 5L)
    // portability configs hold
    assert(s.conf.get("spark.sql.session.timeZone") == "UTC")
    assert(s.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
    // the nanos contract end-to-end: the events table reads and
    // converts without a dedicated reader flag at the call site
    assert(Tables.events(s, sfDir).select("ts").schema.head.dataType
      .typeName == "timestamp")
  }
}

package graft.etl

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {

  test("observe delivers row/null counts through the listener, no extra pass") {
    val df = Tables.events(spark, sfDir)
      .withColumn("maybe_null", when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value")))
    val observed = Metrics.observeLoad(df, "load_metrics", Seq("maybe_null"))
    val l = Metrics.listen(observed)
    val total = observed.count()
    // listener delivery is asynchronous
    var waited = 0
    while (l.results.get("load_metrics").isEmpty && waited < 10000) {
      Thread.sleep(100); waited += 100
    }
    val m = l.results("load_metrics")
    assert(m("n_rows") == total)
    val expectedNulls = df.filter(col("maybe_null").isNull).count()
    assert(m("n_null_maybe_null") == expectedNulls)
    assert(m("__duration_ms").asInstanceOf[Long] >= 0L)
  }
}

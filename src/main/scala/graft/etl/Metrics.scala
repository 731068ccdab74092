package graft.etl

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution
import scala.collection.concurrent.TrieMap

/** Pipeline observability — the engine's replacement for the reference's
  * per-row success/error counters and elapsed-time prints
  * (S9/A10: load_hhs.py:55-64,149-161; load_quality.py:109-110,144-146).
  *
  * Uses `Dataset.observe`: metrics are computed AS the job runs (one
  * accumulator merge per task, no extra pass over the data, no second
  * action) and delivered through a QueryExecutionListener — the
  * distributed form of "count successes while inserting".
  */
object Metrics {

  /** Attach named observation metrics to a load result: row count plus
    * null counts for the given columns. Read back via [[listen]] after
    * an action runs, or aggregate explicitly via counts on the split. */
  def observeLoad(df: DataFrame, name: String, nullCheckCols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      nullCheckCols.map(c => count(when(col(c).isNull, 1)).as(s"n_null_$c"))
    df.observe(name, aggs.head, aggs.tail: _*)
  }

  /** Collects observation results by name as they complete. */
  final class Listener extends QueryExecutionListener {
    val results = new TrieMap[String, Map[String, Any]]()
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row: Row) =>
        results.put(name,
          row.schema.fieldNames.zip(row.toSeq).toMap ++
            Map("__duration_ms" -> durationNs / 1000000L))
      }
    override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()
  }

  /** Register a fresh listener on the session (caller keeps the handle). */
  def listen(df: DataFrame): Listener = {
    val l = new Listener
    df.sparkSession.listenerManager.register(l)
    l
  }
}

package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series resampling: dense periodic calendars and gap-filling —
  * the operator behind "weeks with zero records must still appear"
  * (the reference's week-over-week reporting silently skips empty
  * weeks; a correct time series can't).
  *
  * Scale shape: the calendar derives from a 1-row bounds aggregate and
  * explodes driver-free into at most a few thousand rows — it always
  * broadcasts; the gap-fill join therefore adds NO shuffle beyond what
  * the aggregated series already did. */
object Resample {

  /** Dense date calendar [start, end] every `stepDays`, from a 1-row
    * bounds frame (columns `startCol`, `endCol`). */
  def calendar(bounds: DataFrame, startCol: String, endCol: String,
               stepDays: Int, outCol: String): DataFrame = {
    require(stepDays > 0)
    bounds.select(explode(sequence(col(startCol), col(endCol),
      expr(s"interval $stepDays days"))).as(outCol))
  }

  /** Left-join a (sparse) aggregated series onto a dense calendar and
    * fill the holes. `fills`: column → fill value. */
  def gapFill(cal: DataFrame, series: DataFrame, dateCol: String,
              fills: Map[String, Any]): DataFrame =
    cal.join(series, Seq(dateCol), "left").na.fill(fills)
}

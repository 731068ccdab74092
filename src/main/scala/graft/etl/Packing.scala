package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing: assign ordered documents to fixed token-budget
  * packs — the batching step of a training-data pipeline (documents are
  * conceptually concatenated in (partition, order) sequence and the
  * stream is cut every `budget` tokens; a document's pack is the window
  * its FIRST token lands in).
  *
  * This is the windowed formulation of next-fit packing: exclusive
  * running token count → integer-divide by budget. Fully deterministic,
  * expressible identically in any SQL engine (the oracle replays it),
  * and scale-correct: one window shuffle keyed by the partition
  * columns, no driver-side state. Packs never interleave partitions, so
  * pack construction parallelizes per partition key — at 100 TB the
  * partition column (source/shard) bounds window state per task.
  */
object Packing {

  /** Adds `pack_id` (0-based per partition). `weight` is the token count
    * (or any additive cost) column expression. */
  def packByBudget(df: DataFrame, partitionCols: Seq[String], orderCol: String,
                   weight: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__prev", coalesce(sum(weight).over(w), lit(0L)))
      .withColumn("pack_id", floor(col("__prev") / budget).cast(LongType))
      .drop("__prev")
  }
}

package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD-1 upsert (MERGE semantics as a pure DataFrame op): an update row
  * REPLACES the existing row with the same key; update rows with new
  * keys insert; untouched existing rows persist. The sibling of the
  * reference's insert-if-not-exists dedup (D1-D3) — where that keeps
  * the FIRST version, this keeps the LATEST.
  *
  * Shape: one full-outer join on the key — the single irreducible
  * shuffle. Replacement is row-level (whole update row wins), chosen by
  * key presence, not per-column coalesce — so an update carrying an
  * explicit NULL really nulls the field. Keys must be non-null (the
  * presence test is `isNotNull` on the update key). At warehouse scale
  * this joins two bucketed tables shuffle-free (Scale.writeBucketed on
  * the merge key).
  */
object Upsert {

  /** SCD-2 historization: turn a change log (key, orderCol, attributes)
    * into a validity-interval history — valid_from = the change's own
    * order value, valid_to = the NEXT change's (null while current),
    * is_current on the latest row. One window shuffle keyed by the
    * dimension key; at warehouse scale the change log is the small
    * delta, so the window partitions stay bounded per key. */
  def scd2(changeLog: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    require(keys.nonEmpty)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    changeLog
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", lead(col(orderCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** PRECONDITION: `keys` are unique within BOTH frames. SQL MERGE
    * rejects multiple source matches per target row; a duplicate key
    * here would instead fan out through the full-outer join. With
    * `strict = true` the precondition on `updates` is enforced inside
    * the plan (a window count + assert — one extra shuffle keyed the
    * same as the join, so it co-partitions with the merge at scale);
    * the default keeps the single-shuffle plan and trusts the caller. */
  def upsert(existing: DataFrame, updates: DataFrame, keys: Seq[String],
             strict: Boolean = false): DataFrame = {
    require(keys.nonEmpty)
    require(existing.columns.sameElements(updates.columns),
      "existing and updates must share a schema")
    val u = if (!strict) updates else {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)
      updates.withColumn("_kc", count(lit(1)).over(w))
        .filter(assert_true(col("_kc") === 1,
          lit(s"upsert: duplicate key in updates on (${keys.mkString(", ")}) — " +
            "MERGE semantics forbid multiple matches per target row")).isNull)
        .drop("_kc")
    }
    val updates0 = u
    // alias-qualified references (not Dataset-column ones): updates is
    // routinely DERIVED from existing (a filtered+modified batch), and
    // dataset references into two branches of the same plan are
    // ambiguous in a self-join
    val cond = keys.map(k => s"e.`$k` = u.`$k`").mkString(" AND ")
    val fromU = col(s"u.`${keys.head}`").isNotNull
    val cols = existing.columns.toSeq.map(c =>
      when(fromU, col(s"u.`$c`")).otherwise(col(s"e.`$c`")).as(c))
    existing.alias("e").join(updates0.alias("u"), expr(cond), "full_outer")
      .select(cols: _*)
  }

  /** CDC log application: collapse an insert/update/delete change log
    * to current state — LATEST entry per key wins (by `seqCol`, ties
    * broken by op so replays are deterministic), and a winning delete
    * is a TOMBSTONE that removes the key entirely. The standard
    * change-capture materialization (Debezium-style I/U/D streams);
    * one window shuffle keyed by the merge key. At warehouse scale the
    * log is the small delta — apply it to the base table with
    * [[upsert]] (updates = winners, anti-join = tombstones).
    *
    * @param opCol column holding 'I' | 'U' | 'D'
    * @param keepTombstones keep the winning delete rows instead of
    *   dropping them — required when the result is carried forward as
    *   STATE (incremental/streaming application): without the
    *   tombstone, a late-arriving lower-seq entry in a later batch
    *   would wrongly resurrect the key. Read-side filters op != 'D'. */
  def applyCdc(log: DataFrame, keys: Seq[String], seqCol: String,
               opCol: String, keepTombstones: Boolean = false): DataFrame = {
    require(keys.nonEmpty)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc, col(opCol).desc)
    val winners = log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    if (keepTombstones) winners else winners.filter(col(opCol) =!= "D")
  }
}

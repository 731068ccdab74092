package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication — the reference's signature operator (SURVEY.md §2.4),
  * re-expressed as set-based Spark plans instead of per-row SELECT probes
  * (reference: load_hhs.py:8-32 per-row probe; load_quality.py:13-31
  * set-based probe).
  *
  * Scale notes:
  *  - `firstOccurrenceWins` shuffles once on the key; the window's sort is
  *    per-key within hash partitions, not a global sort. At 100 TB, skewed
  *    keys are handled by AQE skew mitigation; the ordering column should
  *    be a cheap monotonic id captured at scan.
  *  - `antiJoinExisting` plans as broadcast-hash anti-join when the
  *    existing-keys side is small (e.g. a dimension being topped up) and
  *    shuffled sort-merge otherwise — Catalyst/AQE decides from stats.
  *    We deliberately project the existing side to just its key columns
  *    so the broadcast/shuffle payload is minimal.
  */
object Dedup {

  /** D1/D2 within-batch first-occurrence-wins on `keys`, "first" defined
    * by `orderCol` (e.g. a monotonically_increasing_id captured at scan —
    * `dropDuplicates` alone picks an ARBITRARY row, which diverges from
    * the reference's insert-order semantics, load_hhs.py:75,89,103). */
  def firstOccurrenceWins(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Latest-wins dedup: keep the newest row per key (ties broken by
    * `tieCol` descending too) — the temporal complement of first-wins:
    * first-wins preserves the original load, latest-wins keeps the
    * freshest snapshot (CDC/compaction semantics). Same single-shuffle
    * window shape. */
  def latestWins(df: DataFrame, keys: Seq[String], orderCol: String,
                 tieCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*)
      .orderBy(col(orderCol).desc, col(tieCol).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** D3 cross-load dedup: drop rows whose key already exists in the
    * warehouse (reference: load_quality.py:122-126 set-based IN probe).
    * Existing side is pruned to key columns before the anti-join. */
  def antiJoinExisting(incoming: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame =
    incoming.join(existing.select(keys.map(col).toIndexedSeq: _*).distinct(), keys, "left_anti")

  /** The rows REMOVED by cross-load dedup (the reference's reject channel
    * for duplicates, load_quality.py:124). Semi-join = set semantics; the
    * reference's duplicate-index quirk (same row emitted twice,
    * load_hhs.py:82-99) is a documented divergence (SURVEY.md §7.4.7). */
  def duplicatesOfExisting(incoming: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame =
    incoming.join(existing.select(keys.map(col).toIndexedSeq: _*).distinct(), keys, "left_semi")
}

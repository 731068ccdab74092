package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 64-bit SimHash from an array of (raw 64-bit) token hashes: per bit b,
  * sum +1/−1 over token occurrences by whether bit b of the token hash
  * is set; output bit b = 1 iff the sum is positive (ties → 0).
  *
  * Exists for the same reason as [[MinHashesExpr]]: the composable
  * formulation (explode tokens → groupBy(id) with 64 conditional-sum
  * aggregates) shuffles |tokens| rows and evaluates 64 when-expressions
  * per token row. This is one compiled loop per document — the
  * fingerprint is computed inside the scan stage and only the 8-byte
  * hash ever reaches a shuffle, which is the shape a 100 TB dedup run
  * needs (cf. Charikar's SimHash; token multiplicity = occurrence
  * weight, matching the explode/groupBy formulation bit-for-bit).
  */
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<bigint>, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(v: Any): Any =
    SimHashExpr.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.text.SimHashExpr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object SimHashExpr {

  /** Shared by interpreted eval and generated code. Empty token array →
    * all counters 0 → simhash 0. NULL elements are skipped (SQL callers
    * hold array<bigint> with containsNull=true; toLongArray would NPE). */
  def compute(hashes: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      if (!hashes.isNullAt(i)) {
        val h = hashes.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def simhash64(tokenHashes: Column): Column =
    GraftSqlBridge.column(SimHashExpr(GraftSqlBridge.expression(tokenHashes)))
}

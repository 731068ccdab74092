package graft.vector

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Random-hyperplane LSH signature in one compiled pass: bit j of the
  * result = sign of Σᵢ sgn(startPlane+j,i)·vᵢ, where sgn(p,i) is a
  * deterministic ±1 from SplitMix64((p<<32)|i) — no stored plane
  * matrix, identical on every cluster/session. `startPlane` selects a
  * window into the single global plane family, so k DISJOINT
  * signatures (startPlane = 0, w, 2w, …) compose into one wide
  * (k·w)-bit signature without any per-word seed bookkeeping: word b
  * of the wide signature IS `HyperplaneSigExpr(vec, w, b·w)`, and for
  * nBits ≤ 64 the b-th width-w slice of the packed long equals the
  * word formulation bit-for-bit.
  *
  * Replaces the nBits-aggregates-over-zip_with formulation (interpreted,
  * nBits array walks per row) with one nBits×dim compiled loop. */
case class HyperplaneSigExpr(child: Expression, nBits: Int,
                             startPlane: Int = 0)
    extends UnaryExpression {
  require(nBits > 0 && nBits <= 64, "nBits in 1..64")
  require(startPlane >= 0, "startPlane must be non-negative")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig requires array<float>, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override def nullSafeEval(v: Any): Any =
    HyperplaneSigExpr.compute(
      v.asInstanceOf[ArrayData].toFloatArray(), nBits, startPlane)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.vector.HyperplaneSigExpr.compute(" +
        s"$c.toFloatArray(), $nBits, $startPlane);"
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigExpr =
    copy(child = newChild)
}

object HyperplaneSigExpr {
  import graft.util.Hashing.splitmix64

  /** Shared by interpreted eval and generated code. */
  def compute(vec: Array[Float], nBits: Int, startPlane: Int = 0): Long = {
    var sig = 0L
    var j = 0
    while (j < nBits) {
      var acc = 0.0
      var i = 0
      val p = (startPlane + j).toLong
      while (i < vec.length) {
        val s = splitmix64((p << 32) | (i.toLong & 0xffffffffL))
        acc += (if ((s & 1L) == 0L) vec(i).toDouble else -vec(i).toDouble)
        i += 1
      }
      if (acc > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  def signature(vec: Column, nBits: Int, startPlane: Int = 0): Column =
    GraftSqlBridge.column(HyperplaneSigExpr(
      GraftSqlBridge.expression(vec), nBits, startPlane))
}

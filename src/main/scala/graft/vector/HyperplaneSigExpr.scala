package graft.vector

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Random-hyperplane LSH signature in one compiled pass: bit j of the
  * result = sign of Σᵢ sgn(j,i)·vᵢ, where sgn(j,i) is a deterministic
  * ±1 from SplitMix64((j<<32)|i) — no stored plane matrix, identical on
  * every cluster/session.
  *
  * Replaces the nBits-aggregates-over-zip_with formulation (interpreted,
  * nBits array walks per row) with one nBits×dim compiled loop. */
case class HyperplaneSigExpr(child: Expression, nBits: Int)
    extends UnaryExpression {
  require(nBits > 0 && nBits <= 64, "nBits in 1..64")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig requires array<float>, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override def nullSafeEval(v: Any): Any =
    HyperplaneSigExpr.compute(v.asInstanceOf[ArrayData].toFloatArray(), nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.vector.HyperplaneSigExpr.compute($c.toFloatArray(), $nBits);"
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigExpr =
    copy(child = newChild)
}

object HyperplaneSigExpr {
  import graft.util.Hashing.splitmix64

  /** Shared by interpreted eval and generated code. */
  def compute(vec: Array[Float], nBits: Int): Long = {
    var sig = 0L
    var j = 0
    while (j < nBits) {
      var acc = 0.0
      var i = 0
      while (i < vec.length) {
        val s = splitmix64((j.toLong << 32) | (i.toLong & 0xffffffffL))
        acc += (if ((s & 1L) == 0L) vec(i).toDouble else -vec(i).toDouble)
        i += 1
      }
      if (acc > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  def signature(vec: Column, nBits: Int): Column =
    GraftSqlBridge.column(HyperplaneSigExpr(
      GraftSqlBridge.expression(vec), nBits))
}

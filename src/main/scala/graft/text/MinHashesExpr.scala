package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All-in-one-pass MinHash signature: given the array of (raw 64-bit)
  * shingle hashes, computes nHashes minhash values
  * mhⱼ = min over shingles of ((aⱼ·(h mod p) + bⱼ) mod p), p = 2³¹−1.
  *
  * Exists because the composable formulation — nHashes separate
  * `aggregate()` higher-order expressions — runs interpreted and
  * re-walks the shingle array once per permutation; it benchmarked as
  * 80% of the entire suite's runtime at sf0.1. This expression is one
  * compiled loop: |shingles| × nHashes multiply-mods per row, no
  * shuffle, whole-stage codegen.
  *
  * Permutation coefficients derive from SplitMix64 of the permutation
  * index — deterministic everywhere, no stored state.
  */
case class MinHashesExpr(child: Expression, nHashes: Int)
    extends UnaryExpression {

  private val P = MinHashesExpr.P

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhashes requires array<bigint>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhashes"

  @transient private lazy val coeffA: Array[Long] = MinHashesExpr.coeffA(nHashes)
  @transient private lazy val coeffB: Array[Long] = MinHashesExpr.coeffB(nHashes)

  override def nullSafeEval(v: Any): Any = {
    val hs = v.asInstanceOf[ArrayData]
    val out = MinHashesExpr.compute(hs.toLongArray(), coeffA, coeffB)
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("coeffA", coeffA, "long[]")
    val bRef = ctx.addReferenceObj("coeffB", coeffB, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      s"""
         |long[] $out = graft.text.MinHashesExpr.compute(
         |  $c.toLongArray(), $aRef, $bRef);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashesExpr =
    copy(child = newChild)
}

object MinHashesExpr {
  val P = 2147483647L // 2^31 - 1: a·h stays well inside a long

  import graft.util.Hashing.splitmix64
  def coeffA(n: Int): Array[Long] =
    Array.tabulate(n)(i => java.lang.Math.floorMod(splitmix64(2L * i), P - 1) + 1)
  def coeffB(n: Int): Array[Long] =
    Array.tabulate(n)(i => java.lang.Math.floorMod(splitmix64(2L * i + 1), P))

  /** Shared by interpreted eval and generated code. Empty shingle set →
    * all-sentinel signature (P), which never equals a real minhash. */
  def compute(hashes: Array[Long], a: Array[Long], b: Array[Long]): Array[Long] = {
    val n = a.length
    val out = Array.fill(n)(P)
    var i = 0
    while (i < hashes.length) {
      val hm = java.lang.Math.floorMod(hashes(i), P)
      var j = 0
      while (j < n) {
        val v = java.lang.Math.floorMod(a(j) * hm + b(j), P)
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    out
  }

  def minhashes(shingleHashes: Column, nHashes: Int): Column =
    GraftSqlBridge.column(MinHashesExpr(
      GraftSqlBridge.expression(shingleHashes), nHashes))
}

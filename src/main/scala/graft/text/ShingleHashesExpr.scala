package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct k-shingle HASHES from a token array, without ever
  * materializing shingle strings: each token is hashed once (FNV-1a 64
  * over its UTF-8 bytes), then each window of k consecutive token hashes
  * combines polynomially into one 64-bit shingle hash; duplicates drop
  * via an open-addressed long set.
  *
  * Exists because the string formulation — transform(sequence(...),
  * i => concat_ws(" ", slice(tokens, i, k))) + array_distinct — allocates
  * O(tokens · k) UTF8String bytes per document and benchmarked as ~75%
  * of the MinHash pipeline's runtime. Downstream set-similarity only
  * ever consumes HASHES of shingles (MinHash permutations), so the
  * strings are pure waste; a 64-bit hash space makes collisions
  * negligible at any per-document shingle count.
  */
case class ShingleHashesExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(v: Any): Any = new GenericArrayData(
    ShingleHashesExpr.compute(v.asInstanceOf[ArrayData], k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.text.ShingleHashesExpr.compute($c, $k));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

object ShingleHashesExpr {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L
  /** Multiplier for the k-window polynomial combine (odd, high-entropy). */
  private final val Mix = 0x9e3779b97f4a7c15L

  /** Shared by interpreted eval and generated code. Fewer than k tokens →
    * empty result (matches the string formulation's `when(size < k)`). */
  def compute(tokens: ArrayData, k: Int): Array[Long] = {
    val n = tokens.numElements()
    if (n < k) return Array.emptyLongArray
    // 1. hash each token once
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = tokens.getUTF8String(i)
      var h = FnvOffset
      if (s != null) {
        val bytes = s.getBytes
        var j = 0
        while (j < bytes.length) { h = (h ^ (bytes(j) & 0xffL)) * FnvPrime; j += 1 }
      }
      th(i) = h
      i += 1
    }
    // 2. combine each k-window; dedupe via open-addressed set (0 = empty
    //    slot; the rare genuine-0 hash is nudged to 1)
    val nShingles = n - k + 1
    var cap = java.lang.Integer.highestOneBit(nShingles * 4 - 1) << 1
    if (cap < 8) cap = 8
    val table = new Array[Long](cap)
    val mask = cap - 1
    val out = new Array[Long](nShingles)
    var nOut = 0
    i = 0
    while (i < nShingles) {
      var h = 0L
      var j = 0
      while (j < k) { h = h * Mix + th(i + j); j += 1 }
      h = graft.util.Hashing.splitmix64(h)
      if (h == 0L) h = 1L
      var slot = (h.toInt & mask)
      var seen = false
      while (!seen && table(slot) != 0L) {
        if (table(slot) == h) seen = true else slot = (slot + 1) & mask
      }
      if (!seen) {
        table(slot) = h
        out(nOut) = h
        nOut += 1
      }
      i += 1
    }
    if (nOut == nShingles) out else java.util.Arrays.copyOf(out, nOut)
  }

  def shingleHashes(tokens: Column, k: Int): Column =
    GraftSqlBridge.column(ShingleHashesExpr(GraftSqlBridge.expression(tokens), k))
}

package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity (the record-linkage scorer): Jaro with the
  * standard match window ⌊max(|a|,|b|)/2⌋−1 and half-transposition
  * count, then the Winkler prefix boost p=0.1 over a common prefix of
  * at most 4, applied only when jaro > 0.7 — the textbook constants
  * (Winkler 1990), which are also what DuckDB's
  * `jaro_winkler_similarity` implements, so the fz03 oracle can
  * replay the exact scores. Comparison is over UTF-16 code units
  * (identical to code points on the ASCII name domain it targets).
  *
  * Exists as a native Expression for the same reason as
  * [[SimHashExpr]]: the score is computed inside whole-stage codegen
  * in the verify stage of a blocked similarity join — one compiled
  * loop per candidate pair, no UDF serialization on the hot path.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires (string, string), got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerExpr.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.text.JaroWinklerExpr.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerExpr {

  /** Shared by interpreted eval and generated code. Either side empty →
    * 0.0, INCLUDING both-empty — DuckDB's convention (probed), kept so
    * the score is replayable there verbatim. */
  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val matchedA = new Array[Boolean](la)
    val matchedB = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!matchedB(j) && a.charAt(i) == b.charAt(j)) {
          matchedA(i) = true
          matchedB(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk the two matched subsequences in order and
    // count positions that disagree; t = that count / 2 ROUNDED DOWN
    // (integer division — the RapidFuzz/DuckDB convention; an odd
    // mismatch count arises when matching crosses an inserted char,
    // e.g. 'PENNSYLVANIA'/'PENNCISYLVANIA' has 7)
    var k = 0
    var mismatch = 0
    i = 0
    while (i < la) {
      if (matchedA(i)) {
        while (!matchedB(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) mismatch += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val t = (mismatch / 2).toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxP = math.min(4, math.min(la, lb))
    while (prefix < maxP && a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    jaro + 0.1 * prefix * (1.0 - jaro)
  }

  def jaroWinkler(a: Column, b: Column): Column =
    GraftSqlBridge.column(JaroWinklerExpr(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}

package graft.text

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native codegen
  * expression — Spark ships no normalization built-in, yet corpus
  * hygiene needs one early in every text pipeline: the same visible
  * string arrives composed from one crawler and decomposed from
  * another, and every downstream equality — exact dedup fingerprints,
  * shingle hashes, token counts — silently misses unless the bytes
  * are canonicalized first.
  *
  * Fast path: `Normalizer.isNormalized` is a cheap scan (quick-check
  * properties) and virtually all real text is already NFC, so the
  * common case returns the input UTF8String without allocating.
  * Codegen keeps the call inside WholeStageCodegen like the other
  * graft string expressions.
  *
  * Accent stripping composes from this: NFD then drop combining marks
  * (`regexp_replace(.., "\\p{M}", "")`) — oracle-parity with DuckDB's
  * `strip_accents` (f08).
  */
case class NormalizeExpr(child: Expression, form: String) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if NormalizeExpr.formOrdinal(form) >= 0 =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize: form must be one of NFC|NFD|NFKC|NFKD, got '$form'")
    case t => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize requires string, got ${t.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  private lazy val ordinal = NormalizeExpr.formOrdinal(form)

  override def nullSafeEval(v: Any): Any =
    NormalizeExpr.compute(v.asInstanceOf[UTF8String], ordinal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.text.NormalizeExpr.compute($c, $ordinal);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeExpr =
    copy(child = newChild)
}

object NormalizeExpr {
  private val Forms: Array[Normalizer.Form] = Array(
    Normalizer.Form.NFC, Normalizer.Form.NFD,
    Normalizer.Form.NFKC, Normalizer.Form.NFKD)

  def formOrdinal(form: String): Int = Forms.indexWhere(_.name == form)

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String, formOrdinal: Int): UTF8String = {
    val form = Forms(formOrdinal)
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }

  def normalize(text: Column, form: String): Column =
    GraftSqlBridge.column(NormalizeExpr(GraftSqlBridge.expression(text), form))
}

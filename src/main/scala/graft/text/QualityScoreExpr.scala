package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The document quality score in ONE scan of the string.
  *
  * Replicates, bit-for-bit, the composable formulation
  * (TextFunctions.qualityScoreComposed == the x11/cp01 oracle SQL):
  *   ( [5 ≤ nTok ≤ 1000] + [punct/nChars ≤ 0.2]
  *     + min(2·(the+and+of)/nTok, 1) ) / 3
  * with the regex semantics pinned:
  *  - nTok = whitespace-run count of the TRIMMED text, where empty
  *    text counts as ONE token (regexp_split of '' yields ['']);
  *  - whitespace = regex \s = [ \t\n\f\r] (NOT
  *    Character.isWhitespace, which differs on unicode spaces);
  *  - stopword hits use \b boundaries (word char = [A-Za-z0-9_]),
  *    left-to-right non-overlapping like regexp split counting;
  *  - nChars = codepoints (Spark/DuckDB length()).
  *
  * Exists because the composable form evaluates 4+ regex passes per
  * row and predicate pushdown duplicates the whole tree into filters
  * (no subexpression elimination in FilterExec) — it dominated the
  * curation pipeline's cold and warm cost.
  */
case class QualityScoreExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quality_score requires string, got ${t.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "quality_score"

  override def nullSafeEval(v: Any): Any =
    QualityScoreExpr.compute(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.text.QualityScoreExpr.compute($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): QualityScoreExpr =
    copy(child = newChild)
}

object QualityScoreExpr {
  private val Stopwords = Array("the", "and", "of")

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '_'

  /** Shared by interpreted eval and generated code. */
  def compute(s: String): Double = {
    val n = s.length
    // counts in one pass: punct, whitespace-run tokens (of trimmed), \b stopwords
    var punct = 0
    var nTok = 0
    var inTok = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '.' || c == ',' || c == '!' || c == '?' || c == ';' || c == ':') punct += 1
      if (isWs(c)) inTok = false
      else { if (!inTok) nTok += 1; inTok = true }
      i += 1
    }
    // regexp_split_to_array(trim(''), ...) yields [''] → one "token"
    if (nTok == 0) nTok = 1
    var stop = 0
    i = 0
    while (i < n) {
      var w = 0
      var matched = false
      while (!matched && w < Stopwords.length) {
        val sw = Stopwords(w)
        val len = sw.length
        if (i + len <= n && s.regionMatches(i, sw, 0, len) &&
          (i == 0 || !isWordChar(s.charAt(i - 1))) &&
          (i + len == n || !isWordChar(s.charAt(i + len)))) {
          stop += 1
          i += len // non-overlapping, left-to-right, like regex matching
          matched = true
        }
        w += 1
      }
      if (!matched) i += 1
    }
    val nChars = s.codePointCount(0, n).toDouble
    val nTokD = nTok.toDouble
    val lengthOk = if (nTok >= 5 && nTok <= 1000) 1.0 else 0.0
    val punctOk = if (nChars > 0 && punct.toDouble / nChars <= 0.2) 1.0 else 0.0
    val stopTerm = math.min(stop.toDouble / nTokD * 2.0, 1.0)
    (lengthOk + punctOk + stopTerm) / 3.0
  }

  def quality(text: Column): Column =
    GraftSqlBridge.column(QualityScoreExpr(GraftSqlBridge.expression(text)))
}

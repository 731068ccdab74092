package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Grouped token counting in ONE pass: out(g) = Σ over tokens t of
  * |{ w ∈ groups(g) : w = t }| — i.e. each group's total marker-word
  * hits. A word may appear in several groups (each gets the count).
  *
  * Exists because the composable form — per-word `filter(tokens, ...)`
  * higher-order expressions summed per group — runs interpreted with a
  * lambda call per (token × word), and the argmax CASE-fold over those
  * scores duplicates the whole subtree per comparison (FilterExec does
  * no subexpression elimination): language-ID was the cost center of
  * the curation pipeline. Here: one hash probe per token, compiled,
  * one evaluation per row.
  */
case class TokenCountsExpr(child: Expression, groups: Seq[Seq[String]])
    extends UnaryExpression {
  require(groups.nonEmpty && groups.forall(_.nonEmpty))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_counts requires array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "token_group_counts"

  @transient private lazy val index: java.util.HashMap[UTF8String, Array[Int]] =
    TokenCountsExpr.buildIndex(groups)

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(TokenCountsExpr.compute(
      v.asInstanceOf[ArrayData], index, groups.length))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idxRef = ctx.addReferenceObj("index", index, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.text.TokenCountsExpr.compute($c, $idxRef, ${groups.length}));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): TokenCountsExpr =
    copy(child = newChild)
}

object TokenCountsExpr {
  def buildIndex(groups: Seq[Seq[String]]): java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    groups.zipWithIndex.foreach { case (words, g) =>
      words.distinct.foreach { w => // distinct: a dup within one group counts once
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, if (prev == null) Array(g) else prev :+ g)
      }
    }
    m
  }

  /** Shared by interpreted eval and generated code. Null tokens skipped. */
  def compute(tokens: ArrayData, index: java.util.HashMap[UTF8String, Array[Int]],
              nGroups: Int): Array[Int] = {
    val out = new Array[Int](nGroups)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val gs = index.get(tokens.getUTF8String(i))
        if (gs != null) {
          var j = 0
          while (j < gs.length) { out(gs(j)) += 1; j += 1 }
        }
      }
      i += 1
    }
    out
  }

  /** Per-group marker-hit totals as an array<int> column. */
  def groupCounts(tokens: Column, groups: Seq[Seq[String]]): Column =
    GraftSqlBridge.column(TokenCountsExpr(
      GraftSqlBridge.expression(tokens), groups))
}

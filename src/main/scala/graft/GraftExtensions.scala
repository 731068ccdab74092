package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import graft.text.{JaroWinklerExpr, MinHashesExpr, NormalizeExpr, ShingleHashesExpr, SimHashExpr}
import graft.vector.DotProductExpr

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql("SELECT vec_dot(a,b)")`
  * works anywhere (pure-SQL callers, thrift/connect clients). Enable:
  *   SparkSession.builder().withExtensions(new GraftExtensions)  // build time
  *   spark.sql.extensions=graft.GraftExtensions                  // config
  *   GraftExtensions.install(spark)                              // existing session
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(e.injectFunction)
}

object GraftExtensions {
  private def vecDotBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "vec_dot takes exactly 2 arguments")
    DotProductExpr(exprs.head, exprs(1))
  }
  private def minhashesBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "minhashes(hashArray, nHashes)")
    val n = exprs(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"minhashes: nHashes must be an integer literal, got $other")
    }
    MinHashesExpr(exprs.head, n)
  }

  private def shingleHashesBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "shingle_hashes(tokenArray, k)")
    val k = exprs(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"shingle_hashes: k must be an integer literal, got $other")
    }
    ShingleHashesExpr(exprs.head, k)
  }
  private def simhashBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "simhash64(hashArray)")
    SimHashExpr(exprs.head)
  }
  private def normalizeBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "unicode_normalize(str, 'NFC'|'NFD'|'NFKC'|'NFKD')")
    val form = exprs(1) match {
      case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
      case other => throw new IllegalArgumentException(
        s"unicode_normalize: form must be a string literal, got $other")
    }
    NormalizeExpr(exprs.head, form)
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "vec_dot"),
      vecDotBuilder _),
    (FunctionIdentifier("minhashes"),
      new ExpressionInfo(classOf[MinHashesExpr].getName, "minhashes"),
      minhashesBuilder _),
    (FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashesExpr].getName, "shingle_hashes"),
      shingleHashesBuilder _),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "simhash64"),
      simhashBuilder _),
    (FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[NormalizeExpr].getName, "unicode_normalize"),
      normalizeBuilder _),
    (FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerExpr].getName, "jaro_winkler"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 2, "jaro_winkler(str, str)")
        JaroWinklerExpr(exprs.head, exprs(1))
      }))

  /** Register into an already-running session. */
  def install(spark: SparkSession): Unit =
    functions.foreach { case (id, info, b) =>
      GraftSqlBridge.registerFunction(spark, id, info, b)
    }
}

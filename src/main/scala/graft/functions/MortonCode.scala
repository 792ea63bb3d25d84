package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for the compressed morton code (F1,
  * datasource/precomputed/common.py:55-86) — SURVEY §2.10's top custom
  * Expression. Unlike a Scala UDF, this stays inside whole-stage
  * codegen: `doGenCode` emits a direct static call with primitive
  * longs (no boxing, no serialized closure, null-safety handled by the
  * generated prologue).
  */
case class MortonCodeExpr(children: Seq[Expression]) extends Expression {
  require(children.length == 6,
    "graft_morton(gx, gy, gz, nx, ny, nz) takes 6 arguments")

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else graft.core.Morton.encodeRaw(
      vs(0).asInstanceOf[Long], vs(1).asInstanceOf[Long],
      vs(2).asInstanceOf[Long], vs(3).asInstanceOf[Long],
      vs(4).asInstanceOf[Long], vs(5).asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val childCode = evals.map(_.code).reduce(_ + _)
    val anyNull = evals.map(_.isNull).mkString(" || ")
    val args = evals.map(_.value).mkString(", ")
    ev.copy(code = childCode + code"""
      |boolean ${ev.isNull} = $anyNull;
      |long ${ev.value} = -1L;
      |if (!${ev.isNull}) {
      |  ${ev.value} = graft.core.Morton.encodeRaw($args);
      |}""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** Registration: per-session (runtime) or via
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object GraftFunctions {
  val mortonInfo = new ExpressionInfo(classOf[MortonCodeExpr].getName,
    "graft_morton")

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_morton"), mortonInfo,
      (args: Seq[Expression]) => MortonCodeExpr(args))
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((FunctionIdentifier("graft_morton"),
      GraftFunctions.mortonInfo,
      (args: Seq[Expression]) => MortonCodeExpr(args)))
}

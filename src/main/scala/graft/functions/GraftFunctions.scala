package graft.functions

import graft.core.{Hash61, Normalize, StringSim}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot scalar functions (SURVEY.md §7.3
  * optional candidate (1)): expression nodes instead of Scala UDFs keep null
  * handling, constant folding and filter pushdown available to the
  * optimizer, and avoid the UDF serialization wall. CodegenFallback is
  * acceptable here: the eval path is a tight JVM call, and these run inside
  * already-codegen'd stages.
  */

/** Jaro similarity in [0,1] (python-Levenshtein `jaro` semantics,
  * `feature_calculator.py:199`).
  */
case class JaroSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(l: Any, r: Any): Any =
    StringSim.jaro(l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "jaro_sim"
}

/** The F1 normalize (ED blocking key, `linking_data.py:14-19`). */
case class NormalizeSurface(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(Normalize.normalize(v.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_normalize"
}

/** Portable 61-bit hash ([[graft.core.Hash61]]) as a native expression WITH
  * whole-stage codegen (`doGenCode` emits a static call — no fallback, no
  * UDF wall): the hot path for fingerprinting / simhash / LSH signatures.
  */
case class Hash61Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    Hash61.hash(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.Hash61.hash($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "hash61"
}

object GraftFunctions {
  /** Column-API faces. Require `register(spark)` once per session; the
    * expressions then resolve through the function registry (the public
    * Column↔Expression bridge in Spark 4).
    */
  def jaro_sim(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("jaro_sim", a, b)
  def graft_normalize(c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_normalize", c)

  /** hash61 without registry dependence (operators call it directly). */
  def hash61(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      Hash61Expr(org.apache.spark.sql.GraftColumnBridge.expression(c)))

  /** SQL-surface registration (temp functions on an existing session). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_sim", exprs => JaroSimilarity(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_normalize", exprs => NormalizeSurface(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hash61", exprs => Hash61Expr(exprs.head), "scala_udf")
  }
}

/** SparkSessionExtensions entry point:
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("jaro_sim"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[JaroSimilarity].getName, "jaro_sim"),
      (exprs: Seq[Expression]) => JaroSimilarity(exprs(0), exprs(1))))
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("graft_normalize"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[NormalizeSurface].getName, "graft_normalize"),
      (exprs: Seq[Expression]) => NormalizeSurface(exprs.head)))
    // keep the two registration paths surface-identical: register() exposes
    // jaro_sim + graft_normalize + hash61, so the extensions path must too
    // (round-5 review)
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("hash61"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[Hash61Expr].getName, "hash61"),
      (exprs: Seq[Expression]) => Hash61Expr(exprs.head)))
  }
}

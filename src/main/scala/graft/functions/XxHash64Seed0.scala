package graft.functions

import graft.core.XxHash64
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: XXH64(UTF-8 bytes, seed 0) of a string
  * column — bit-parity with the kernel hash used by the crawl engine's
  * text-dedup dictionary (graft.core.TextStats.textHash), which mirrors the
  * reference's `NLPTextAnalyzer.ComputeStableHash`
  * (`wordslab.nlptextdoc/NLPTextAnalyzer.cs:269-274`).
  *
  * Spark's builtin `xxhash64` is the same algorithm at seed 42 over the
  * internal encoding; this expression pins seed 0 over raw UTF-8 bytes and
  * participates in whole-stage codegen (SURVEY.md §2.11: the one custom
  * Expression the engine can justify).
  */
case class XxHash64Seed0(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  def inputTypes: Seq[DataType] = Seq(StringType)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"xxhash64_seed0 requires a string argument, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any =
    XxHash64.hash(input.asInstanceOf[UTF8String].getBytes, 0L)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.core.XxHash64$$.MODULE$$.hash($c.getBytes(), 0L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object XxHash64Seed0 {
  /** Column-level entry point. */
  def xxhash64_seed0(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.toColumn(
      XxHash64Seed0(org.apache.spark.sql.GraftColumnBridge.toExpression(c)))

  /** Register as a SQL function `xxhash64_seed0`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "xxhash64_seed0", exprs => XxHash64Seed0(exprs.head), "scala_udf")
}

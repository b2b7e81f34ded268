package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode normalization (NFC/NFD/NFKC/NFKD,
  * `java.text.Normalizer`) of a string column — the canonicalization step a
  * text-cleanup pipeline runs before hashing/dedup (é as one codepoint and
  * é as e+U+0301 must fingerprint identically). An Expression with
  * `doGenCode` rather than a UDF, so it stays inside whole-stage codegen
  * like the built-in string functions (SURVEY.md §2.11 preference order);
  * DuckDB's `nfc_normalize` is the oracle twin of the NFC form.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(UnicodeNormalize.Forms.contains(form), s"bad form $form")

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize requires a string argument, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormalize.kernel(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.functions.UnicodeNormalize$$.MODULE$$.kernel($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {

  private[functions] val Forms = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Static kernel shared by eval and generated code. */
  def kernel(s: UTF8String, form: String): UTF8String = {
    val f = form match {
      case "NFC" => java.text.Normalizer.Form.NFC
      case "NFD" => java.text.Normalizer.Form.NFD
      case "NFKC" => java.text.Normalizer.Form.NFKC
      case _ => java.text.Normalizer.Form.NFKD
    }
    val str = s.toString
    // normalized-form check is O(n) and usually true for real text — skip
    // the allocation-heavy normalize pass when it is
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }

  private def wrap(c: Column, form: String): Column =
    org.apache.spark.sql.GraftColumnBridge.toColumn(
      UnicodeNormalize(org.apache.spark.sql.GraftColumnBridge.toExpression(c), form))

  def nfc(c: Column): Column = wrap(c, "NFC")
  def nfd(c: Column): Column = wrap(c, "NFD")
  def nfkc(c: Column): Column = wrap(c, "NFKC")
  def nfkd(c: Column): Column = wrap(c, "NFKD")

  /** Accent folding: NFD then strip combining marks — DuckDB's
    * `strip_accents` twin for decomposable Latin text.
    */
  def foldAccents(c: Column): Column =
    org.apache.spark.sql.functions.regexp_replace(nfd(c), "\\p{M}", "")

  /** SQL expression builder — ONE definition shared by `register` and
    * `GraftExtensions.injectFunction`, with an arity check (a bare
    * exprs(1) would surface as IndexOutOfBounds on 1-arg calls).
    */
  def sqlBuilder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"unicode_normalize expects (string, form literal), got ${exprs.length} argument(s)")
    val form = exprs(1) match {
      case lit: org.apache.spark.sql.catalyst.expressions.Literal =>
        String.valueOf(lit.value)
      case other =>
        throw new IllegalArgumentException(
          s"unicode_normalize form must be a string literal, got $other")
    }
    UnicodeNormalize(exprs.head, form)
  }

  /** Register as SQL `unicode_normalize(str, 'NFC'|'NFD'|'NFKC'|'NFKD')`
    * (the form must be a literal).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unicode_normalize", sqlBuilder, "scala_udf")
}

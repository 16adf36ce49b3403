package graft.spark.expressions

import graft.core.{Scrub, TextDedup}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot text operators.
  *
  * Versus the ScalaUDF route these stay INSIDE whole-stage codegen: no
  * ScalaUDF shim, no catalyst↔scala converters, no closure dispatch — the
  * generated code calls a static JVM helper directly on the UTF8String.
  * The regex semantics are exactly `graft.core` (same compiled Patterns),
  * so golden-vector parity carries over unchanged.
  *
  * Registered under `scrub_tags` / `fingerprint64` / `simhash64` via
  * [[GraftExtensions]] (`spark.sql.extensions=graft.spark.expressions.GraftExtensions`)
  * or [[GraftExtensions.install]] on an existing session.
  */
object ExprHelpers {
  def scrubTags(s: UTF8String): UTF8String =
    UTF8String.fromString(Scrub.scrubTags(s.toString))
  def fingerprint64(s: UTF8String): Long = TextDedup.fingerprint(s.toString)
  def simhash64(s: UTF8String): Long = TextDedup.simHash(s.toString)
}

abstract class GraftUnaryStringExpression extends UnaryExpression
    with Serializable {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
  /** Fully-qualified static call target, e.g. "...ExprHelpers.scrubTags". */
  protected def helper: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$helper($c)")
}

/** `scrub_tags(text)` — single-pass union-regex scrub with fixed tags. */
case class ScrubTagsExpr(child: Expression) extends GraftUnaryStringExpression {
  override def dataType: DataType = StringType
  override protected def helper: String =
    "graft.spark.expressions.ExprHelpers.scrubTags"
  override def nullSafeEval(input: Any): Any =
    ExprHelpers.scrubTags(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): ScrubTagsExpr =
    copy(child = newChild)
  override def prettyName: String = "scrub_tags"
}

/** `fingerprint64(text)` — normalized rolling-hash document fingerprint. */
case class Fingerprint64Expr(child: Expression) extends GraftUnaryStringExpression {
  override def dataType: DataType = LongType
  override protected def helper: String =
    "graft.spark.expressions.ExprHelpers.fingerprint64"
  override def nullSafeEval(input: Any): Any =
    ExprHelpers.fingerprint64(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Fingerprint64Expr =
    copy(child = newChild)
  override def prettyName: String = "fingerprint64"
}

/** `simhash64(text)` — 64-bit SimHash over word unigrams. */
case class SimHash64Expr(child: Expression) extends GraftUnaryStringExpression {
  override def dataType: DataType = LongType
  override protected def helper: String =
    "graft.spark.expressions.ExprHelpers.simhash64"
  override def nullSafeEval(input: Any): Any =
    ExprHelpers.simhash64(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** Session-extension hook: `--conf spark.sql.extensions=graft.spark.expressions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.registrations.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.spark.expressions", name, usage)

  val registrations: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("scrub_tags", info("scrub_tags", "_FUNC_(text) - single-pass PII scrub with <KIND> tags"),
      (args: Seq[Expression]) => ScrubTagsExpr(args.head)),
    ("fingerprint64", info("fingerprint64", "_FUNC_(text) - normalized doc fingerprint"),
      (args: Seq[Expression]) => Fingerprint64Expr(args.head)),
    ("simhash64", info("simhash64", "_FUNC_(text) - 64-bit simhash"),
      (args: Seq[Expression]) => SimHash64Expr(args.head)))

  /** Register on an already-built session (tests, notebooks). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (name, i, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), i, builder)
    }
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst dot product over two numeric-array columns (SURVEY.md
  * §2.9 custom-Expression surface; used by the §2.11 similarity operators).
  * Accepts any float/double element combination — the IVF pipeline scores
  * float corpus vectors against double centroid arrays.
  *
  * Left-to-right double accumulation over the array — bit-identical to the
  * SQL ordered-fold forms in [[graft.ops.textsql]] (Spark `aggregate` HOF and
  * DuckDB `list_reduce`; float→double casts are exact, so the mixed case
  * folds the same bits), but ~10-100× faster than interpreted lambda
  * evaluation: the hot loop is a primitive while-loop over ArrayData with no
  * per-element closure dispatch. Deterministic under any partitioning —
  * the fold happens entirely inside one row.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  private def isDouble(t: DataType): Boolean =
    t match { case ArrayType(DoubleType, _) => true; case _ => false }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot needs two array<float|double> args, got ${left.dataType} / ${right.dataType}")

  // Ragged inputs yield NULL — same as the SQL ordered folds (Spark
  // zip_with / DuckDB list_zip pad with NULL, nulling the sum), so the
  // bit-identical-to-SQL contract holds on every input, not just
  // equal-length ones.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else FloatDotProduct.dot(x, y,
      isDouble(left.dataType), isDouble(right.dataType))
  }

  /** Static-call codegen: the kernel stays a single JVM method invocation
    * inside the whole-stage-generated code — no interpreted-eval dispatch,
    * no InternalRow boxing per row (the CodegenFallback path pays both).
    * Element widths are compile-time literals, so the JIT specializes the
    * kernel's branches away per call site. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (ld, rd) = (isDouble(left.dataType), isDouble(right.dataType))
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
       if ($a.numElements() != $b.numElements()) {
         ${ev.isNull} = true;
       } else {
         ${ev.value} = graft.functions.FloatDotProduct.dot($a, $b, $ld, $rd);
       }""")
  }

  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object FloatDotProduct {
  /** Left-to-right double accumulation — the shared kernel for both eval
    * paths; bit-identical to the SQL ordered folds (float→double widening
    * is exact). Callers guarantee equal lengths (ragged pairs are nulled
    * out before reaching here). `xd`/`yd` select the element getter; the
    * codegen path passes them as literals so the JIT folds the branches. */
  def dot(x: ArrayData, y: ArrayData, xd: Boolean, yd: Boolean): Double = {
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val a = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
      val b = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
      acc += a * b
      i += 1
    }
    acc
  }
}

/** Native integer dot product over two BIGINT-array columns — the SQ8
  * asymmetric-distance kernel (sim_sq_rerank's stage-1 scan): quantized
  * codes score against quantized codes in pure integer arithmetic, so the
  * result is EXACT (order-free, no float accumulation at all) and the
  * candidate cut it ranks is deterministic by construction. Same
  * static-call codegen shape as [[FloatDotProduct]]; ragged inputs yield
  * NULL (the zip_with/list_zip contract). */
case class CodeDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"code_dot needs two array<bigint> args, got ${left.dataType} / ${right.dataType}")

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else CodeDotProduct.dot(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
       if ($a.numElements() != $b.numElements()) {
         ${ev.isNull} = true;
       } else {
         ${ev.value} = graft.functions.CodeDotProduct.dot($a, $b);
       }""")

  override def prettyName: String = "code_dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CodeDotProduct {
  /** Integer kernel — exact and order-free; SQ8 codes are ≤ 255 so a
    * 64-dim dot is ≤ 2²² — overflow needs ~2⁴⁷ dims. */
  def dot(x: ArrayData, y: ArrayData): Long = {
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }
}

/** Registration of graft's native functions.
  *
  * Library users: `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`.
  * Internal operators call [[GraftFunctions.register]] (idempotent per
  * session) so the harness sessions need no special config.
  */
object GraftFunctions {
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "vec_dot"),
      (c: Seq[Expression]) => FloatDotProduct(c(0), c(1))),
    (FunctionIdentifier("code_dot"),
      new ExpressionInfo(classOf[CodeDotProduct].getName, "code_dot"),
      (c: Seq[Expression]) => CodeDotProduct(c(0), c(1))),
    (FunctionIdentifier("stable_hash64"),
      new ExpressionInfo(classOf[StableHash64].getName, "stable_hash64"),
      (c: Seq[Expression]) => StableHash64(c(0))),
    (FunctionIdentifier("threshold_distinct"),
      new ExpressionInfo(classOf[ThresholdDistinct].getName, "threshold_distinct"),
      (c: Seq[Expression]) => {
        val k = c(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"threshold_distinct(col, k): k must be a literal, got $other")
        }
        ThresholdDistinct(c(0), k).toAggregateExpression()
      }),
    (FunctionIdentifier("topk_rows"),
      new ExpressionInfo(classOf[TopKRows].getName, "topk_rows"),
      (c: Seq[Expression]) => {
        if (c.length != 4) throw new IllegalArgumentException(
          s"topk_rows(ord, key1, key2, k) takes 4 arguments, got ${c.length}")
        val k = c(3) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"topk_rows(ord, key1, key2, k): k must be an INT literal, got $other")
        }
        TopKRows(c(0), c(1), c(2), k).toAggregateExpression()
      }),
    (FunctionIdentifier("count_min"),
      new ExpressionInfo(classOf[CountMinSketch].getName, "count_min"),
      (c: Seq[Expression]) => CountMinSketch(c(0)).toAggregateExpression()),
    (FunctionIdentifier("tokenize"),
      new ExpressionInfo(classOf[TokenizeGenerator].getName, "tokenize"),
      (c: Seq[Expression]) => TokenizeGenerator(c(0))),
    (FunctionIdentifier("vis_check"),
      new ExpressionInfo(classOf[VisibilityCheck].getName, "vis_check"),
      (c: Seq[Expression]) => VisibilityCheck(c(0), c(1))),
    (FunctionIdentifier("phash64"),
      new ExpressionInfo(classOf[PHash64].getName, "phash64"),
      (c: Seq[Expression]) => PHash64(c(0))),
    (FunctionIdentifier("ahash64"),
      new ExpressionInfo(classOf[AHash64].getName, "ahash64"),
      (c: Seq[Expression]) => AHash64(c(0))),
    (FunctionIdentifier("vhash64"),
      new ExpressionInfo(classOf[VHash64].getName, "vhash64"),
      (c: Seq[Expression]) => VHash64(c(0))))

  private val done = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  def register(spark: SparkSession): Unit = if (done.add(spark)) {
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

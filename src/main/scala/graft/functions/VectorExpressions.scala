package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native (whole-stage-codegen) vector kernels over `array<float>`
  * embedding columns.
  *
  * The reference computes Tanimoto similarity per (target, source) pair
  * with an interpreted per-row Python call (/root/reference/dags/modules/
  * tanimoto.py:138-139). Re-expressed on Spark, the per-pair kernel is the
  * innermost loop of an O(N*M) cross join, so it must stay inside
  * whole-stage codegen: a higher-order `aggregate(zip_with(...))` falls
  * back to interpreted evaluation, ~50x slower at 10^8 pairs. These
  * expressions generate a tight primitive loop instead.
  *
  * Accumulation is sequential in double precision (index 0..n-1), which is
  * exactly the semantics the DuckDB oracle SQL mirrors with
  * `list_sum(list_transform(...))` over `DOUBLE[]`.
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {
  // inputs are always ArrayType(FloatType) — constructed internally only
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}

/** Euclidean norm of an `array<float>`, accumulated in double. */
case class NormF(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "norm_f"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val v = x.getFloat(i).toDouble
      s += v * v
      i += 1
    }
    math.sqrt(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double) $a.getFloat($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NormF =
    copy(child = newChild)
}

object VectorExpressions {
  /** Register `dot_f` / `norm_f` as SQL-callable temp functions on the
    * session. Idempotent; every query entry calls it.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "dot_f", exprs => DotProductF(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "norm_f", exprs => NormF(exprs.head), "built-in")
  }
}

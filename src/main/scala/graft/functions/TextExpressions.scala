package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Expression forms of the [[TextHash]] kernels.
  *
  * `tok_hash`/`shingle_set` sit in the single hottest path of the
  * library — every shingle of the corpus flows through them in the
  * MinHash/n-gram/fingerprint pipelines ([[graft.queries.Dedup
  * .rawPostings]] is the only text-processing stage, and these ARE it).
  * As Scala UDFs each call crossed the UDF wrapper (converter
  * allocation + boxed apply) per row; as expressions the generated code
  * calls the static kernel directly and the operator stays inside
  * whole-stage codegen. The arithmetic is byte-identical — the
  * expressions delegate to the same [[TextHash]] methods the property
  * tests and the DuckDB oracle twins pin down.
  *
  * Null semantics: null in → null out (standard expression contract,
  * and what the `CASE WHEN length(...)` oracle twins produce); the
  * corpus columns these run on are non-null.
  */
abstract class TextHashUnary extends UnaryExpression with ImplicitCastInputTypes {
  // AbstractDataType is private[sql] in Spark 4 — rely on inference
  // rather than naming the return type
  override def inputTypes = Seq(StringType)
}

/** Polynomial rolling hash (TextHash.tokenHash) as a codegen expression. */
case class TokHash(child: Expression) extends TextHashUnary {
  override def dataType: DataType = LongType
  override def prettyName: String = "tok_hash"
  override def nullSafeEval(a: Any): Any =
    TextHash.tokenHash(a.toString)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextHash.tokenHash($a.toString())")
  override protected def withNewChildInternal(newChild: Expression): TokHash =
    copy(child = newChild)
}

/** Distinct 3-token shingles (TextHash.shingleSet) as an expression. */
case class ShingleSet(child: Expression) extends TextHashUnary {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_set"
  override def nullSafeEval(a: Any): Any =
    TextHash.shingleArrayData(a.toString)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextHash.shingleArrayData($a.toString())")
  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

/** Min rolling hash over shingles (TextHash.shingleMin). */
case class ShingleMin(child: Expression) extends TextHashUnary {
  override def dataType: DataType = LongType
  override def prettyName: String = "shingle_min"
  override def nullSafeEval(a: Any): Any =
    TextHash.shingleMin(a.toString)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextHash.shingleMin($a.toString())")
  override protected def withNewChildInternal(newChild: Expression): ShingleMin =
    copy(child = newChild)
}

/** 32-bit SimHash (TextHash.simhash32). */
case class SimHash32(child: Expression) extends TextHashUnary {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"
  override def nullSafeEval(a: Any): Any =
    TextHash.simhash32(a.toString)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextHash.simhash32($a.toString())")
  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

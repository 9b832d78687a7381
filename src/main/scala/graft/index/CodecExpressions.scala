package graft.index

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Catalyst expressions E1/E2 (SURVEY.md §2.9): varint / delta-gap codec
  * as native unary expressions with `doGenCode`, so encode/decode fuse
  * into whole-stage codegen (no UDF serialization, no fallback). Both the
  * interpreted and generated paths call the same [[VarintCodec]] statics.
  */
abstract class CodecExpression extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  /** Fully-qualified static method on VarintCodec. */
  protected def method: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.index.VarintCodec.$method($c)")
}

/** array<long> → binary (plain varints). */
case class VarintEncode(child: Expression) extends CodecExpression {
  override def dataType: DataType = BinaryType
  override protected def method: String = "encode"
  override def nullSafeEval(v: Any): Any =
    VarintCodec.encode(v.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(c: Expression): VarintEncode = copy(c)
}

/** binary → array<long> (plain varints). */
case class VarintDecode(child: Expression) extends CodecExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def method: String = "decode"
  override def nullSafeEval(v: Any): Any =
    VarintCodec.decode(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): VarintDecode = copy(c)
}

/** ascending array<long> → binary (first value + delta gaps, varint). */
case class VarintDeltaEncode(child: Expression) extends CodecExpression {
  override def dataType: DataType = BinaryType
  override protected def method: String = "encodeDelta"
  override def nullSafeEval(v: Any): Any =
    VarintCodec.encodeDelta(v.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(c: Expression): VarintDeltaEncode = copy(c)
}

/** binary → ascending array<long>. */
case class VarintDeltaDecode(child: Expression) extends CodecExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def method: String = "decodeDelta"
  override def nullSafeEval(v: Any): Any =
    VarintCodec.decodeDelta(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): VarintDeltaDecode = copy(c)
}

/** array<array<long>> (ascending inners) → binary (nested layout:
  * varint(len) + delta-gap values per inner — the positions stream). */
case class VarintNestedEncode(child: Expression) extends CodecExpression {
  override def dataType: DataType = BinaryType
  override protected def method: String = "encodeNested"
  override def nullSafeEval(v: Any): Any =
    VarintCodec.encodeNested(v.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(c: Expression): VarintNestedEncode = copy(c)
}

/** binary → array<array<long>> (nested layout). */
case class VarintNestedDecode(child: Expression) extends CodecExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override protected def method: String = "decodeNested"
  override def nullSafeEval(v: Any): Any =
    VarintCodec.decodeNested(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): VarintNestedDecode = copy(c)
}

/** monotone array<long> → binary (Elias–Fano; [[EliasFano]] layout). */
case class EliasFanoEncode(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    EliasFano.encode(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.index.EliasFano.encode($c)")
  override protected def withNewChildInternal(c: Expression): EliasFanoEncode = copy(c)
}

/** binary → monotone array<long> (Elias–Fano). */
case class EliasFanoDecode(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    EliasFano.decode(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.index.EliasFano.decode($c)")
  override protected def withNewChildInternal(c: Expression): EliasFanoDecode = copy(c)
}

/** array<long> (non-negative) → binary (FOR bit-packed blocks). */
case class ForPackEncode(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    ForUtil.encode(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.index.ForUtil.encode($c)")
  override protected def withNewChildInternal(c: Expression): ForPackEncode = copy(c)
}

/** binary → array<long> (FOR bit-packed blocks). */
case class ForPackDecode(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    ForUtil.decode(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.index.ForUtil.decode($c)")
  override protected def withNewChildInternal(c: Expression): ForPackDecode = copy(c)
}

/** non-decreasing array<long> → binary (FOR-delta — Lucene ForDeltaUtil). */
case class ForDeltaEncode(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    ForUtil.encodeDelta(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.index.ForUtil.encodeDelta($c)")
  override protected def withNewChildInternal(c: Expression): ForDeltaEncode = copy(c)
}

/** binary → non-decreasing array<long> (FOR-delta). */
case class ForDeltaDecode(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    ForUtil.decodeDelta(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.index.ForUtil.decodeDelta($c)")
  override protected def withNewChildInternal(c: Expression): ForDeltaDecode = copy(c)
}

/** Column-level API for the codec expressions. */
object codec {
  def varintEncode(c: Column): Column = Shims.column(VarintEncode(Shims.expression(c)))
  def varintDecode(c: Column): Column = Shims.column(VarintDecode(Shims.expression(c)))
  def varintDeltaEncode(c: Column): Column = Shims.column(VarintDeltaEncode(Shims.expression(c)))
  def varintDeltaDecode(c: Column): Column = Shims.column(VarintDeltaDecode(Shims.expression(c)))
  def varintNestedEncode(c: Column): Column = Shims.column(VarintNestedEncode(Shims.expression(c)))
  def varintNestedDecode(c: Column): Column = Shims.column(VarintNestedDecode(Shims.expression(c)))
  def efEncode(c: Column): Column = Shims.column(EliasFanoEncode(Shims.expression(c)))
  def efDecode(c: Column): Column = Shims.column(EliasFanoDecode(Shims.expression(c)))
  def forEncode(c: Column): Column = Shims.column(ForPackEncode(Shims.expression(c)))
  def forDecode(c: Column): Column = Shims.column(ForPackDecode(Shims.expression(c)))
  def forDeltaEncode(c: Column): Column = Shims.column(ForDeltaEncode(Shims.expression(c)))
  def forDeltaDecode(c: Column): Column = Shims.column(ForDeltaDecode(Shims.expression(c)))
}

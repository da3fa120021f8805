package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.roaringbitmap.longlong.Roaring64NavigableMap

/** Native Catalyst aggregate tier for sketch/bitmap state (SURVEY.md §2.4).
  *
  * These are TypedImperativeAggregates — Spark's object-buffer aggregate
  * shape (planned as ObjectHashAggregate with map-side partials), where
  * `serialize`/`deserialize` define the EXACT bytes that cross the shuffle.
  * For the bitmap that is the Roaring portable format and for the quantile
  * state the KLL sketch image — no Java/kryo object-stream wrapping at all,
  * which is the round-1 finding ("javaSerialization per shuffle record is the
  * slowest option") resolved at the root: the wire format IS the sketch.
  *
  * Doris' equivalents: BITMAP_UNION over BitmapValue
  * [doris: be/src/util/bitmap_value.h] and QUANTILE_UNION over QuantileState
  * (a re-aggregable TDigest/KLL-style column) — both are mergeable
  * intermediate states materializable in AGGREGATE-key tables; the two-level
  * (pre-aggregate, then re-merge) flow is exercised by the
  * `agg_bitmap_rollup` / `agg_quantile_state` keys.
  */
object NativeAggregates {

  // ---- BITMAP_UNION(bigint) -> roaring bytes -----------------------------

  case class BitmapUnion(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Roaring64NavigableMap]
    with UnaryLike[Expression] {

    override def createAggregationBuffer(): Roaring64NavigableMap =
      new Roaring64NavigableMap()
    override def update(b: Roaring64NavigableMap, row: InternalRow): Roaring64NavigableMap = {
      val v = child.eval(row)
      if (v != null) b.addLong(v.asInstanceOf[Long])
      b
    }
    override def merge(b: Roaring64NavigableMap, o: Roaring64NavigableMap): Roaring64NavigableMap = {
      b.or(o); b
    }
    override def eval(b: Roaring64NavigableMap): Any = BitmapFunctions.serialize(b)
    override def serialize(b: Roaring64NavigableMap): Array[Byte] =
      BitmapFunctions.serialize(b)
    override def deserialize(bytes: Array[Byte]): Roaring64NavigableMap =
      BitmapFunctions.deserialize(bytes)
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def prettyName: String = "bitmap_union"
    override def withNewMutableAggBufferOffset(n: Int): BitmapUnion =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): BitmapUnion =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(newChild: Expression): BitmapUnion =
      copy(child = newChild)
  }

  /** BITMAP_UNION over an already-bitmap (binary) column — the re-aggregable
    * second level: per-fine-group bitmaps union into coarser groups without
    * touching raw rows (Doris AGGREGATE-key BITMAP_UNION merge-on-read). */
  case class BitmapUnionBinary(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Roaring64NavigableMap]
    with UnaryLike[Expression] {

    override def createAggregationBuffer(): Roaring64NavigableMap =
      new Roaring64NavigableMap()
    override def update(b: Roaring64NavigableMap, row: InternalRow): Roaring64NavigableMap = {
      val v = child.eval(row)
      if (v != null) b.or(BitmapFunctions.deserialize(v.asInstanceOf[Array[Byte]]))
      b
    }
    override def merge(b: Roaring64NavigableMap, o: Roaring64NavigableMap): Roaring64NavigableMap = {
      b.or(o); b
    }
    override def eval(b: Roaring64NavigableMap): Any = BitmapFunctions.serialize(b)
    override def serialize(b: Roaring64NavigableMap): Array[Byte] =
      BitmapFunctions.serialize(b)
    override def deserialize(bytes: Array[Byte]): Roaring64NavigableMap =
      BitmapFunctions.deserialize(bytes)
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def prettyName: String = "bitmap_union_binary"
    override def withNewMutableAggBufferOffset(n: Int): BitmapUnionBinary =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): BitmapUnionBinary =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(newChild: Expression): BitmapUnionBinary =
      copy(child = newChild)
  }

  // ---- QUANTILE_STATE: mergeable KLL quantile sketch ---------------------

  /** TO_QUANTILE_STATE aggregate: double values -> KLL sketch bytes. */
  case class QuantileState(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch]
    with UnaryLike[Expression] {

    override def createAggregationBuffer(): KllDoublesSketch =
      KllDoublesSketch.newHeapInstance(200)
    override def update(b: KllDoublesSketch, row: InternalRow): KllDoublesSketch = {
      val v = child.eval(row)
      if (v != null) b.update(v.asInstanceOf[Double])
      b
    }
    override def merge(b: KllDoublesSketch, o: KllDoublesSketch): KllDoublesSketch = {
      b.merge(o); b
    }
    override def eval(b: KllDoublesSketch): Any = b.toByteArray
    override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray
    override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
      KllDoublesSketch.heapify(Memory.wrap(bytes))
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def prettyName: String = "to_quantile_state"
    override def withNewMutableAggBufferOffset(n: Int): QuantileState =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): QuantileState =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(newChild: Expression): QuantileState =
      copy(child = newChild)
  }

  /** QUANTILE_UNION aggregate: merge KLL sketch bytes -> sketch bytes. */
  case class QuantileUnion(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch]
    with UnaryLike[Expression] {

    override def createAggregationBuffer(): KllDoublesSketch =
      KllDoublesSketch.newHeapInstance(200)
    override def update(b: KllDoublesSketch, row: InternalRow): KllDoublesSketch = {
      val v = child.eval(row)
      if (v != null)
        b.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
      b
    }
    override def merge(b: KllDoublesSketch, o: KllDoublesSketch): KllDoublesSketch = {
      b.merge(o); b
    }
    override def eval(b: KllDoublesSketch): Any = b.toByteArray
    override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray
    override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
      KllDoublesSketch.heapify(Memory.wrap(bytes))
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def prettyName: String = "quantile_union"
    override def withNewMutableAggBufferOffset(n: Int): QuantileUnion =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): QuantileUnion =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(newChild: Expression): QuantileUnion =
      copy(child = newChild)
  }

  // ---- registration + Column API -----------------------------------------

  /** Register native aggregates on the session's FunctionRegistry (the
    * public Spark 4 route for custom Expressions — same pattern as
    * [[TokenCount.register]]). Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_bitmap_union", exprs => BitmapUnion(exprs.head).toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_bitmap_union_binary", exprs => BitmapUnionBinary(exprs.head).toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction(
      "to_quantile_state", exprs => QuantileState(exprs.head).toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction(
      "quantile_union", exprs => QuantileUnion(exprs.head).toAggregateExpression(), "built-in")
  }

  def bitmap_union_native(c: Column): Column = call_function("graft_bitmap_union", c)
  def bitmap_union_binary(c: Column): Column = call_function("graft_bitmap_union_binary", c)
  def to_quantile_state(c: Column): Column = call_function("to_quantile_state", c)
  def quantile_union(c: Column): Column = call_function("quantile_union", c)
}

package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.roaringbitmap.longlong.Roaring64NavigableMap

import scala.collection.mutable.ArrayBuffer

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

  // ---- QUANTILE_STATE: deterministic mergeable quantile summary ----------
  //
  // Doris' QUANTILE_STATE is a re-aggregable quantile column
  // [doris: be/src/util/quantile_state.h]. Round 2 backed it with DataSketches
  // KLL, whose compaction is RANDOMIZED — two identical runs gave different
  // estimates, violating the engine's determinism contract (QueryDef.scala).
  // This tier instead uses Spark's own Greenwald-Khanna summary
  // (catalyst.util.QuantileSummaries, the approxQuantile engine): GK has no
  // randomness, but its merge is order-SENSITIVE, and shuffle block fetch
  // order is not deterministic. So the aggregation buffer never GK-merges
  // eagerly: it accumulates the per-map-task partial images, and eval/output
  // canonicalizes — sort images lexicographically, then fold-merge in that
  // fixed order. Same input → same bytes, under any fetch order.
  //
  // Scale: a partial image at eps=0.01 is ~dozens of Stats triples (~KB); the
  // buffer holds one per map task per group. Beyond MaxPartials the buffer
  // pre-collapses (canonically, over the sorted current set) to bound memory;
  // estimates stay within the GK bound (determinism is guaranteed up to
  // MaxPartials partials per group — far beyond this harness's 32).

  /** Relative rank error of the GK summary (matches approxQuantile default). */
  private val Eps = 0.01
  private val MaxPartials = 4096

  private def emptySummary: QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, Eps)

  /** Mutable agg buffer: a live GK summary for raw updates + the partial
    * images received from the shuffle, canonicalized only at eval. */
  final class QuantileBuffer(
      var own: QuantileSummaries,
      val partials: ArrayBuffer[Array[Byte]])

  /** Single-summary image: [count][m][m × (value, g, delta)]. relativeError /
    * compressThreshold are engine constants, not serialized. */
  private def encodeSummary(s: QuantileSummaries): Array[Byte] = {
    val c = if (s.compressed) s else s.compress()
    val st = c.sampled
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + st.length * 24)
    bb.putLong(c.count).putInt(st.length)
    st.foreach { t => bb.putDouble(t.value).putLong(t.g).putLong(t.delta) }
    bb.array()
  }

  private def decodeSummary(bytes: Array[Byte]): QuantileSummaries = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val count = bb.getLong()
    val st = Array.fill(bb.getInt()) {
      new QuantileSummaries.Stats(bb.getDouble(), bb.getLong(), bb.getLong())
    }
    new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, Eps, st, count, true)
  }

  /** Canonical reduction: sort images by bytes, fold-merge in that order. */
  private def canonicalMerge(images: Seq[Array[Byte]]): QuantileSummaries = {
    val sorted = images.sortWith(java.util.Arrays.compare(_, _) < 0)
    sorted.foldLeft(emptySummary) { (acc, img) =>
      val a = if (acc.compressed) acc else acc.compress()
      a.merge(decodeSummary(img))
    }
  }

  /** The deterministic p-quantile readout of a state image. */
  def queryState(bytes: Array[Byte], p: Double): Option[Double] =
    decodeSummary(bytes).query(p)

  private[functions] def bufferImages(b: QuantileBuffer): Seq[Array[Byte]] = {
    val out = ArrayBuffer.empty[Array[Byte]]
    out ++= b.partials
    if (b.own.count > 0 || !b.own.compressed) {
      val c = b.own.compress()
      if (c.count > 0) out += encodeSummary(c)
    }
    out.toSeq
  }

  /** Shared TypedImperativeAggregate plumbing for the two quantile aggs. */
  abstract class QuantileAggBase
    extends TypedImperativeAggregate[QuantileBuffer] with UnaryLike[Expression] {
    def child: Expression

    override def createAggregationBuffer(): QuantileBuffer =
      new QuantileBuffer(emptySummary, ArrayBuffer.empty)

    protected final def addPartial(b: QuantileBuffer, img: Array[Byte]): Unit = {
      b.partials += img
      if (b.partials.length > MaxPartials) {
        val collapsed = encodeSummary(canonicalMerge(bufferImages(b).toIndexedSeq))
        b.own = emptySummary
        b.partials.clear()
        b.partials += collapsed
      }
    }

    override def merge(b: QuantileBuffer, o: QuantileBuffer): QuantileBuffer = {
      bufferImages(o).foreach(addPartial(b, _))
      b
    }
    override def eval(b: QuantileBuffer): Any =
      encodeSummary(canonicalMerge(bufferImages(b)))
    override def serialize(b: QuantileBuffer): Array[Byte] = {
      val imgs = bufferImages(b)
      val bb = java.nio.ByteBuffer.allocate(4 + imgs.map(4 + _.length).sum)
      bb.putInt(imgs.length)
      imgs.foreach { i => bb.putInt(i.length).put(i) }
      bb.array()
    }
    override def deserialize(bytes: Array[Byte]): QuantileBuffer = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val n = bb.getInt()
      val partials = ArrayBuffer.fill(n) {
        val img = new Array[Byte](bb.getInt()); bb.get(img); img
      }
      new QuantileBuffer(emptySummary, partials)
    }
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
  }

  /** TO_QUANTILE_STATE aggregate: double values -> GK summary bytes. */
  case class QuantileState(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0) extends QuantileAggBase {

    override def update(b: QuantileBuffer, row: InternalRow): QuantileBuffer = {
      val v = child.eval(row)
      if (v != null) b.own = b.own.insert(v.asInstanceOf[Double])
      b
    }
    override def prettyName: String = "to_quantile_state"
    override def withNewMutableAggBufferOffset(n: Int): QuantileState =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): QuantileState =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(newChild: Expression): QuantileState =
      copy(child = newChild)
  }

  /** QUANTILE_UNION aggregate: merge state bytes -> state bytes. */
  case class QuantileUnion(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0) extends QuantileAggBase {

    override def update(b: QuantileBuffer, row: InternalRow): QuantileBuffer = {
      val v = child.eval(row)
      if (v != null) addPartial(b, v.asInstanceOf[Array[Byte]])
      b
    }
    override def prettyName: String = "quantile_union"
    override def withNewMutableAggBufferOffset(n: Int): QuantileUnion =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): QuantileUnion =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(newChild: Expression): QuantileUnion =
      copy(child = newChild)
  }

  // ---- TOPN: mergeable heavy-hitters counter (SpaceSaving-style) ---------
  //
  // Doris TOPN(col, k) is an approximate heavy-hitters counter
  // [doris: be/src/vec/aggregate_functions/aggregate_function_topn.h].
  // Determinism design (same concern as QUANTILE_STATE): eviction depends on
  // arrival order, so eviction happens ONLY map-side (per-partition input
  // order is deterministic); the shuffle merge is pure count-map addition —
  // commutative and associative, hence immune to fetch order — and the
  // final collapse to k happens once at eval under the canonical
  // (count desc, value asc) rule. Per-group merged state is bounded by
  // partials × capacity (each partial is pre-collapsed to capacity).
  // When capacity >= distinct values per partition the counts are EXACT
  // (that's what the DuckDB oracle checks); under pressure an entry admitted
  // after eviction inherits the evicted floor as its error bound, the
  // SpaceSaving overestimate contract (asserted in ScalaTest).

  final class TopNBuffer(
      val counts: java.util.HashMap[Long, Array[Long]], // value -> [count, err]
      var floor: Long)

  case class TopNCounter(
      child: Expression,
      k: Int,
      capacity: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopNBuffer] with UnaryLike[Expression] {

    override def createAggregationBuffer(): TopNBuffer =
      new TopNBuffer(new java.util.HashMap, 0L)

    private def collapse(b: TopNBuffer): Unit = {
      if (b.counts.size > capacity) {
        val entries = new java.util.ArrayList(b.counts.entrySet())
        entries.sort { (x, y) =>
          val c = java.lang.Long.compare(y.getValue()(0), x.getValue()(0))
          if (c != 0) c else java.lang.Long.compare(x.getKey, y.getKey)
        }
        var i = capacity
        while (i < entries.size()) {
          b.floor = math.max(b.floor, entries.get(i).getValue()(0))
          b.counts.remove(entries.get(i).getKey)
          i += 1
        }
      }
    }

    override def update(b: TopNBuffer, row: InternalRow): TopNBuffer = {
      val v = child.eval(row)
      if (v != null) {
        val key = v.asInstanceOf[Long]
        val cur = b.counts.get(key)
        if (cur != null) cur(0) += 1
        else {
          // a value first seen after evictions may have been evicted before:
          // admit at the floor (SpaceSaving inherit) with err = floor
          b.counts.put(key, Array(b.floor + 1, b.floor))
          if (b.counts.size > capacity * 4) collapse(b)
        }
      }
      b
    }

    override def merge(b: TopNBuffer, o: TopNBuffer): TopNBuffer = {
      o.counts.forEach { (key, oc) =>
        val cur = b.counts.get(key)
        if (cur != null) { cur(0) += oc(0); cur(1) += oc(1) }
        else b.counts.put(key, oc.clone())
      }
      b.floor = math.max(b.floor, o.floor)
      b
    }

    override def eval(b: TopNBuffer): Any = {
      collapse(b)
      val entries = new java.util.ArrayList(b.counts.entrySet())
      entries.sort { (x, y) =>
        val c = java.lang.Long.compare(y.getValue()(0), x.getValue()(0))
        if (c != 0) c else java.lang.Long.compare(x.getKey, y.getKey)
      }
      val n = math.min(k, entries.size())
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < n) {
        if (i > 0) sb.append(',')
        sb.append(entries.get(i).getKey).append(':').append(entries.get(i).getValue()(0))
        i += 1
      }
      org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
    }

    override def serialize(b: TopNBuffer): Array[Byte] = {
      collapse(b) // bound the shuffled image to capacity entries
      val bb = java.nio.ByteBuffer.allocate(8 + 4 + b.counts.size * 24)
      bb.putLong(b.floor).putInt(b.counts.size)
      b.counts.forEach { (key, c) => bb.putLong(key).putLong(c(0)).putLong(c(1)) }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): TopNBuffer = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val floor = bb.getLong()
      val n = bb.getInt()
      val m = new java.util.HashMap[Long, Array[Long]](n * 2)
      var i = 0
      while (i < n) { m.put(bb.getLong(), Array(bb.getLong(), bb.getLong())); i += 1 }
      new TopNBuffer(m, floor)
    }

    override def dataType: DataType = StringType
    override def nullable: Boolean = false
    override def prettyName: String = "graft_topn"
    override def withNewMutableAggBufferOffset(n: Int): TopNCounter =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): TopNCounter =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(newChild: Expression): TopNCounter =
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
    reg.createOrReplaceTempFunction(
      "graft_topn", exprs => TopNCounter(exprs.head,
        exprs(1).eval().asInstanceOf[Int],
        exprs(2).eval().asInstanceOf[Int]).toAggregateExpression(), "built-in")
  }

  def bitmap_union_native(c: Column): Column = call_function("graft_bitmap_union", c)
  def bitmap_union_binary(c: Column): Column = call_function("graft_bitmap_union_binary", c)
  def to_quantile_state(c: Column): Column = call_function("to_quantile_state", c)
  def quantile_union(c: Column): Column = call_function("quantile_union", c)
  /** Doris TOPN(col, k): "v:count" CSV of the k heaviest values. */
  def topn_counter(c: Column, k: Int, capacity: Int = 1024): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("graft_topn", c, lit(k), lit(capacity))
  }
}

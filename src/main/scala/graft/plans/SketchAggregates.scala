package graft.plans

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{BloomFilterAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded-memory mergeable sketches as native Catalyst aggregates
  * (SURVEY §4 "avoid UDFs on hot paths"): heavy-hitters and broadcast
  * membership run as first-class aggregate expressions, so partial
  * aggregation (map-side combine) and whole-stage codegen around them
  * come for free — the shape a 100 TB frequency/membership pass needs
  * (a plain groupBy over an unbounded key domain would shuffle the
  * whole corpus; the sketch shuffles `capacity` rows per partition).
  */

/** SpaceSaving (Metwally et al.) heavy-hitters summary. Stored items
  * carry (countUpperBound, error); any unstored item's true count is
  * ≤ min stored count. When `capacity` ≥ the number of distinct items
  * no eviction ever happens and every count is EXACT with error 0 —
  * the property the oracle key relies on at test scale, while the same
  * plan at 100 TB degrades gracefully to ±n/capacity bounds instead of
  * OOMing. */
final class SpaceSavingSummary(val capacity: Int) {
  /** item → (count upper bound, overestimation error) */
  val items: mutable.HashMap[UTF8String, (Long, Long)] = mutable.HashMap.empty

  /** True once any item has EVER been evicted (or truncated away in a
    * merge). The exactness predicate: while false, every stored count
    * is the true count — tracked explicitly, NOT inferred from
    * `size == capacity` (a summary holding exactly `capacity` distinct
    * items without overflow is still exact, and must merge with floor 0
    * or the counts would silently inflate right at the boundary). */
  var lossy: Boolean = false

  private def minCount: Long =
    if (items.isEmpty) 0L else items.valuesIterator.map(_._1).min

  /** Standard SpaceSaving update: hit → increment; miss with room →
    * insert; miss at capacity → evict the min-count item and inherit
    * its count as the new item's error bound. */
  def add(item: UTF8String, inc: Long): Unit = {
    items.get(item) match {
      case Some((c, e)) => items.update(item, (c + inc, e))
      case None if items.size < capacity => items.update(item, (inc, 0L))
      case None =>
        // O(capacity) eviction scan: fine for the capacities this engine
        // uses (≤ 64k) because evictions only happen once the summary is
        // full; a Stream-Summary bucket list is the constant-time upgrade.
        val (evictItem, (evictCount, _)) = items.minBy(_._2._1)
        items.remove(evictItem)
        items.update(item, (evictCount + inc, evictCount))
        lossy = true
    }
  }

  /** Mergeable-summaries union (Agarwal et al.): an item absent from a
    * LOSSY side may have been evicted there, so that side contributes
    * its min count as both count and error; absent from a lossless side
    * means truly unseen (contributes 0). Keep the top `capacity` by
    * merged count. */
  def mergeIn(other: SpaceSavingSummary): Unit = {
    val selfFloor = if (lossy) minCount else 0L
    val otherFloor = if (other.lossy) {
      if (other.items.isEmpty) 0L else other.items.valuesIterator.map(_._1).min
    } else 0L
    val union = mutable.HashMap.empty[UTF8String, (Long, Long)]
    for ((k, (c, e)) <- items) {
      val (oc, oe) = other.items.getOrElse(k, (otherFloor, otherFloor))
      union.update(k, (c + oc, e + oe))
    }
    for ((k, (c, e)) <- other.items if !items.contains(k)) {
      union.update(k, (c + selfFloor, e + selfFloor))
    }
    items.clear()
    lossy = lossy || other.lossy
    if (union.size <= capacity) items ++= union
    else {
      // deterministic survivor set: count desc, then item asc
      val kept = union.toSeq.sortBy { case (k, (c, _)) => (-c, k) }.take(capacity)
      items ++= kept
      lossy = true
    }
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(capacity)
    out.writeBoolean(lossy)
    out.writeInt(items.size)
    for ((k, (c, e)) <- items) {
      val b = k.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }
}

object SpaceSavingSummary {
  def deserialize(bytes: Array[Byte]): SpaceSavingSummary = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val s = new SpaceSavingSummary(in.readInt())
    s.lossy = in.readBoolean()
    var n = in.readInt()
    while (n > 0) {
      val len = in.readInt(); val b = new Array[Byte](len); in.readFully(b)
      s.items.update(UTF8String.fromBytes(b), (in.readLong(), in.readLong()))
      n -= 1
    }
    s
  }
}

/** `space_saving_topk(item, capacity)` — aggregates a string column into
  * an `array<struct<item,cnt,err>>` sorted (cnt desc, item asc), at most
  * `capacity` entries. A `TypedImperativeAggregate`, so Spark runs it
  * with partial aggregation: each task builds a bounded summary, the
  * exchange moves only summaries, and the reducer merges — constant
  * memory and shuffle regardless of key cardinality. */
case class SpaceSavingAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingSummary]
  with UnaryLike[Expression] with ImplicitCastInputTypes with Serializable {

  require(capacity > 0, s"space_saving_topk capacity must be > 0: $capacity")

  // analysis-time contract (wrong-typed SQL args otherwise surface as
  // executor ClassCastExceptions); numerics implicitly cast to string
  override def inputTypes: Seq[GraftColumnBridge.AbstractType] = Seq(StringType)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "space_saving_topk"

  override def createAggregationBuffer(): SpaceSavingSummary =
    new SpaceSavingSummary(capacity)

  override def update(buf: SpaceSavingSummary, input: InternalRow): SpaceSavingSummary = {
    val v = child.eval(input)
    // clone: the UTF8String may point into a reused row buffer
    if (v != null) buf.add(v.asInstanceOf[UTF8String].clone(), 1L)
    buf
  }

  override def merge(buf: SpaceSavingSummary, other: SpaceSavingSummary): SpaceSavingSummary = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: SpaceSavingSummary): Any = {
    val sorted = buf.items.toSeq.sortBy { case (k, (c, _)) => (-c, k) }
    new GenericArrayData(sorted.map { case (k, (c, e)) =>
      new GenericInternalRow(Array[Any](k, c, e))
    }.toArray[Any])
  }

  override def serialize(buf: SpaceSavingSummary): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): SpaceSavingSummary =
    SpaceSavingSummary.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SpaceSavingAgg =
    copy(child = newChild)
}

/** Ben-Haim & Tom-Tov streaming histogram: at most `capacity` (centroid,
  * count) bins kept sorted by centroid; overflow merges the two CLOSEST
  * adjacent bins (weighted mean, summed count). While every input value
  * has its own bin the histogram is EXACT — the property the oracle key
  * relies on at test scale; under compression rank queries degrade
  * smoothly (error bounded by the largest merged bin's weight), the
  * classic decision-tree/quantile sketch trade. */
final class StreamingHistogram(val capacity: Int) {
  /** centroid → weight, sorted by centroid. */
  val bins: java.util.TreeMap[java.lang.Double, Long] =
    new java.util.TreeMap[java.lang.Double, Long]()

  def add(v: Double, w: Long): Unit = {
    val prev = bins.get(v)
    bins.put(v, if (prev == null) w else prev + w)
    if (bins.size > capacity) compressOnce()
  }

  /** Merge the adjacent pair with the smallest centroid gap (ties →
    * the leftmost pair, so compression is deterministic). */
  private def compressOnce(): Unit = {
    val it = bins.keySet.iterator
    var prev = it.next()
    var bestLo = prev
    var bestGap = Double.MaxValue
    while (it.hasNext) {
      val cur = it.next()
      val gap = cur - prev
      if (gap < bestGap) { bestGap = gap; bestLo = prev }
      prev = cur
    }
    val hi = bins.higherKey(bestLo)
    val wLo = bins.remove(bestLo)
    val wHi = bins.remove(hi)
    val w = wLo + wHi
    bins.put((bestLo * wLo + hi * wHi) / w, w)
  }

  def mergeIn(other: StreamingHistogram): Unit = {
    other.bins.forEach { (v, w) => add(v, w) }
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(capacity)
    out.writeInt(bins.size)
    bins.forEach { (v, w) => out.writeDouble(v); out.writeLong(w) }
    out.flush(); bos.toByteArray
  }
}

object StreamingHistogram {
  def deserialize(bytes: Array[Byte]): StreamingHistogram = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val h = new StreamingHistogram(in.readInt())
    var n = in.readInt()
    while (n > 0) { h.bins.put(in.readDouble(), in.readLong()); n -= 1 }
    h
  }
}

/** `streaming_histogram(value, capacity)` — aggregates a numeric column
  * into an `array<struct<value,cnt>>` sorted by value, at most
  * `capacity` bins: the mergeable quantile-sketch counterpart of exact
  * rank arithmetic (x18 ↔ x37 pair). */
case class StreamingHistogramAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[StreamingHistogram]
  with UnaryLike[Expression] with ImplicitCastInputTypes with Serializable {

  require(capacity > 1, s"streaming_histogram capacity must be > 1: $capacity")

  // any numeric (incl. DECIMAL) arrives pre-cast to double; non-castable
  // types fail analysis instead of throwing per-row on executors
  override def inputTypes: Seq[GraftColumnBridge.AbstractType] = Seq(DoubleType)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", DoubleType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "streaming_histogram"

  override def createAggregationBuffer(): StreamingHistogram =
    new StreamingHistogram(capacity)

  override def update(buf: StreamingHistogram, input: InternalRow): StreamingHistogram = {
    val v = child.eval(input)
    if (v != null) {
      val d = v match {
        case l: java.lang.Long => l.toDouble
        case i: java.lang.Integer => i.toDouble
        case d: java.lang.Double => d.doubleValue()
        case f: java.lang.Float => f.toDouble
        case s: java.lang.Short => s.toDouble
        case b: java.lang.Byte => b.toDouble
        case other => throw new IllegalArgumentException(
          s"streaming_histogram: non-numeric input $other")
      }
      // NaN would poison the sorted-bin invariant (unordered vs every key)
      if (!d.isNaN) buf.add(d, 1L)
    }
    buf
  }

  override def merge(buf: StreamingHistogram, other: StreamingHistogram): StreamingHistogram = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: StreamingHistogram): Any = {
    val out = new Array[Any](buf.bins.size)
    var i = 0
    val it = buf.bins.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(i) = new GenericInternalRow(Array[Any](e.getKey.doubleValue(), e.getValue))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: StreamingHistogram): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): StreamingHistogram =
    StreamingHistogram.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): StreamingHistogramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): StreamingHistogramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): StreamingHistogramAgg =
    copy(child = newChild)
}

/** Bounded top-k sample state: the k best (key, id, weight) rows under
  * the ordering (key DESC, id ASC). EXACT top-k — not a sketch: the
  * heap is a lossless selection, it just never materializes more than
  * k rows per (task × group). */
final class TopKSample(val capacity: Int) {
  /** min-heap on the ordering, worst at head (the eviction candidate). */
  val heap: mutable.PriorityQueue[(Double, Long, Long)] =
    mutable.PriorityQueue.empty(Ordering.by {
      case (key, id, _) => (-key, id) // reverse of (key desc, id asc)
    })

  private def beats(a: (Double, Long, Long), b: (Double, Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  def add(e: (Double, Long, Long)): Unit = {
    if (heap.size < capacity) heap.enqueue(e)
    else if (beats(e, heap.head)) { heap.dequeue(); heap.enqueue(e) }
  }

  def mergeIn(other: TopKSample): Unit = other.heap.foreach(add)

  /** (key desc, id asc) — the emission order. */
  def sorted: Seq[(Double, Long, Long)] =
    heap.toSeq.sortBy { case (key, id, _) => (-key, id) }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(capacity)
    out.writeInt(heap.size)
    heap.foreach { case (k, i, w) =>
      out.writeDouble(k); out.writeLong(i); out.writeLong(w)
    }
    out.flush(); bos.toByteArray
  }
}

object TopKSample {
  def deserialize(bytes: Array[Byte]): TopKSample = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val s = new TopKSample(in.readInt())
    var n = in.readInt()
    while (n > 0) {
      s.heap.enqueue((in.readDouble(), in.readLong(), in.readLong()))
      n -= 1
    }
    s
  }
}

/** `topk_sample(key, id, weight, k)` — per group, the k rows with the
  * largest `key` (ties → smaller `id`), as a sorted
  * `array<struct<sample_key,doc_id,weight>>`. The single-pass form of
  * "rank per group, keep rank ≤ k": a window top-k sorts EVERY group
  * member through the exchange, this aggregate's partials carry at most
  * k rows per task×group — the difference between shuffling the corpus
  * and shuffling the sample at 100 TB. Pair a seeded Efraimidis-
  * Spirakis key with it for weighted sampling (x32/x41). */
case class TopKSampleAgg(
    first: Expression, second: Expression, third: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKSample]
  with org.apache.spark.sql.catalyst.trees.TernaryLike[Expression]
  with ImplicitCastInputTypes with Serializable {

  require(capacity > 0, s"topk_sample capacity must be > 0: $capacity")

  // (sample key, id, weight) — DECIMAL keys / INT ids implicitly cast
  // here; a non-numeric argument is an analysis error, not a runtime CCE
  override def inputTypes: Seq[GraftColumnBridge.AbstractType] =
    Seq(DoubleType, LongType, LongType)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sample_key", DoubleType, nullable = false),
    StructField("doc_id", LongType, nullable = false),
    StructField("weight", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_sample"

  override def createAggregationBuffer(): TopKSample = new TopKSample(capacity)

  override def update(buf: TopKSample, input: InternalRow): TopKSample = {
    val k = first.eval(input)
    val i = second.eval(input)
    val w = third.eval(input)
    if (k != null && i != null && w != null) {
      buf.add((k.asInstanceOf[Number].doubleValue(),
        i.asInstanceOf[Number].longValue(),
        w.asInstanceOf[Number].longValue()))
    }
    buf
  }

  override def merge(buf: TopKSample, other: TopKSample): TopKSample = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: TopKSample): Any =
    new GenericArrayData(buf.sorted.map { case (k, i, w) =>
      new GenericInternalRow(Array[Any](k, i, w))
    }.toArray[Any])

  override def serialize(buf: TopKSample): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): TopKSample =
    TopKSample.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSampleAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSampleAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): TopKSampleAgg =
    copy(first = f, second = s, third = t)
}

/** Column-DSL entry points for the sketch aggregates + the broadcast
  * bloom probe (Spark's own runtime-filter machinery, exposed as a
  * first-class operator: build is a distributed native aggregate, probe
  * is a codegen'd expression over a constant filter). */
object SketchFunctions {

  def topkSample(key: Column, id: Column, weight: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKSampleAgg(GraftColumnBridge.expression(key),
        GraftColumnBridge.expression(id),
        GraftColumnBridge.expression(weight), k)
        .toAggregateExpression())

  def streamingHistogram(value: Column, capacity: Int): Column =
    GraftColumnBridge.column(
      StreamingHistogramAgg(GraftColumnBridge.expression(value), capacity)
        .toAggregateExpression())

  def spaceSavingTopK(item: Column, capacity: Int): Column =
    GraftColumnBridge.column(
      SpaceSavingAgg(GraftColumnBridge.expression(item), capacity)
        .toAggregateExpression())

  /** Distributed bloom build over a LONG column (hash first: `xxhash64`).
    * Returns one BINARY row — the serialized filter. */
  def bloomAgg(hashed: Column, expectedItems: Long, fpp: Double): Column = {
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    GraftColumnBridge.column(
      new BloomFilterAggregate(
        GraftColumnBridge.expression(hashed),
        Literal(expectedItems, LongType),
        Literal(numBits, LongType)).toAggregateExpression())
  }

  /** Codegen'd membership probe against a constant serialized bloom
    * filter (the collected output of [[bloomAgg]] — a few hundred KB,
    * the same driver round-trip Spark's InjectRuntimeFilter does). */
  def mightContain(bloomBytes: Array[Byte], hashed: Column): Column =
    GraftColumnBridge.column(
      BloomFilterMightContain(
        Literal(bloomBytes, BinaryType),
        GraftColumnBridge.expression(hashed)))
}

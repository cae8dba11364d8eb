package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Misra–Gries frequent-items sketch (Misra & Gries 1982; merge rule from
  * Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * A k-counter summary with the guarantee: every item with true count
  * > n/(k+1) is present, and each kept estimate undercounts its true
  * count by at most n/(k+1). Partial-aggregatable: update is the classic
  * k-counter maintenance; merge sums counters then subtracts the
  * (k+1)-largest count from everything (the mergeable-summaries rule),
  * preserving the error bound — so the map side ships k counters per
  * partition, never a per-key table.
  *
  * graft uses it as the CANDIDATE pass of exact heavy hitters
  * (`ops.HeavyHitters`): sketch → ≤k candidates → exact recount of just
  * those keys. The end result is exact (oracle = plain GROUP BY/HAVING),
  * while the sketch bounds the recount join to k keys however large the
  * key domain is — the hot-key detector that never builds the full
  * per-key aggregate twice.
  */
case class MgSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Long, Long]]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(k > 0, "k must be positive")

  override def prettyName: String = "mg_sketch"
  override def children: Seq[Expression] = Seq(child)
  // update() reads the child as a Long: declare it, so a non-long column
  // (easy to hit via the SQL-registered mg_sketch) coerces when implicit
  // casting allows and fails ANALYSIS with a readable message when it
  // doesn't — instead of a runtime ClassCastException inside the aggregate
  // (narrowed to Seq[DataType]: AbstractDataType is private[sql])
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType), StructField("est", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[Long, Long] =
    new java.util.HashMap[Long, Long](k * 2)

  /** Classic MG update: increment a live counter, claim a free slot, or
    * decrement ALL counters (the pigeonhole step — amortized O(1)). */
  private def offer(buf: java.util.HashMap[Long, Long], key: Long, by: Long): Unit = {
    val cur = buf.get(key)
    if (cur != 0L || buf.containsKey(key)) {
      buf.put(key, cur + by)
    } else if (buf.size < k) {
      buf.put(key, by)
    } else {
      // decrement everything by the new item's weight (bounded by the
      // smallest current counter to keep all counters >= 0)
      var dec = by
      val vs = buf.values().iterator()
      while (vs.hasNext) dec = math.min(dec, vs.next())
      if (dec > 0) {
        val es = buf.entrySet().iterator()
        while (es.hasNext) { val e = es.next(); e.setValue(e.getValue - dec) }
      }
      val rem = by - dec
      // drop zeroed counters; the new key claims a slot if one freed
      val it = buf.entrySet().iterator()
      while (it.hasNext) if (it.next().getValue == 0L) it.remove()
      if (rem > 0 && buf.size < k) buf.put(key, rem)
    }
  }

  override def update(
      buf: java.util.HashMap[Long, Long], input: InternalRow): java.util.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Long], 1L)
    buf
  }

  /** Mergeable-summaries rule: sum counters; if over capacity, subtract
    * the (k+1)-th largest count from all and drop non-positive. */
  override def merge(
      buf: java.util.HashMap[Long, Long],
      other: java.util.HashMap[Long, Long]): java.util.HashMap[Long, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.merge(e.getKey, e.getValue, (a, b) => a + b)
    }
    if (buf.size > k) {
      val counts = new Array[Long](buf.size)
      var j = 0
      val vs = buf.values().iterator()
      while (vs.hasNext) { counts(j) = vs.next(); j += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(buf.size - k - 1) // (k+1)-th largest
      val es = buf.entrySet().iterator()
      while (es.hasNext) {
        val e = es.next()
        if (e.getValue - cut <= 0L) es.remove() else e.setValue(e.getValue - cut)
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[Long, Long]): Any = {
    val entries = new Array[(Long, Long)](buf.size)
    var j = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(j) = (e.getKey, e.getValue); j += 1 }
    // deterministic output order: estimate desc, id asc
    val sorted = entries.sortBy { case (id, est) => (-est, id) }
    new GenericArrayData(sorted.map { case (id, est) =>
      InternalRow(id, est)
    }: Array[Any])
  }

  override def serialize(buf: java.util.HashMap[Long, Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); bb.putLong(e.getKey); bb.putLong(e.getValue) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Long, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.put(bb.getLong, bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MgSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MgSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0))
}

object MgSketch {
  /** Column API: array<struct<id, est>> of ≤k Misra–Gries counters. */
  def mgSketch(key: Column, k: Int): Column =
    ColumnBridge.column(
      MgSketch(ColumnBridge.expression(key), k).toAggregateExpression())
}

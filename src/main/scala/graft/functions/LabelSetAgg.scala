package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Open-addressing hash set of primitive longs (full uint64 domain —
  * occupancy lives in a parallel flag array, so no key value is
  * reserved as a sentinel). Linear probing, power-of-two capacity,
  * ×2 growth at 3/4 load. Exists because the agg buffer must never
  * box per label: a java.util.HashSet[java.lang.Long] allocates per
  * insert, which at millions of labels per partition is the
  * difference between an in-cache probe loop and GC pressure.
  */
final class LongHashSet(initialCapacity: Int = 64) {
  private var cap = Integer.highestOneBit(
    math.max(16, initialCapacity - 1) << 1)
  private var keys = new Array[Long](cap)
  private var used = new Array[Boolean](cap)
  private var n = 0

  def size: Int = n

  private def slot(v: Long): Int = {
    // Stafford mix13 finalizer — avalanches low bits for the mask
    var z = v
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)).toInt & (cap - 1)
  }

  def add(v: Long): Unit = {
    if ((n + 1) * 4 > cap * 3) grow()
    var i = slot(v)
    while (used(i)) {
      if (keys(i) == v) return
      i = (i + 1) & (cap - 1)
    }
    keys(i) = v; used(i) = true; n += 1
  }

  private def grow(): Unit = {
    val ok = keys; val ou = used; val oc = cap
    cap <<= 1
    keys = new Array[Long](cap)
    used = new Array[Boolean](cap)
    n = 0
    var i = 0
    while (i < oc) {
      if (ou(i)) add(ok(i))
      i += 1
    }
  }

  /** Insertion-agnostic dump (unsorted). */
  def toArray: Array[Long] = {
    val out = new Array[Long](n)
    var i = 0; var j = 0
    while (i < cap) {
      if (used(i)) { out(j) = keys(i); j += 1 }
      i += 1
    }
    out
  }
}

/** Open-addressing long->long hash map, the two-array sibling of
  * [[LongHashSet]] (same Stafford-mix probe, parallel occupancy flags
  * so the full uint64 key domain is admissible). Exists for hot
  * per-voxel probe loops — e.g. the halo-exchange stencil taps a
  * neighbor table once per out-of-chunk stencil tap, where a boxed
  * java.util.HashMap[java.lang.Long, ...] allocates two boxes per put
  * and one per get (r15 advisor).
  */
final class LongLongMap(initialCapacity: Int = 64) {
  private var cap = Integer.highestOneBit(
    math.max(16, initialCapacity - 1) << 1)
  private var keys = new Array[Long](cap)
  private var vals = new Array[Long](cap)
  private var used = new Array[Boolean](cap)
  private var n = 0

  def size: Int = n

  private def slot(v: Long): Int = {
    var z = v
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)).toInt & (cap - 1)
  }

  def put(k: Long, v: Long): Unit = {
    if ((n + 1) * 4 > cap * 3) grow()
    var i = slot(k)
    while (used(i)) {
      if (keys(i) == k) { vals(i) = v; return }
      i = (i + 1) & (cap - 1)
    }
    keys(i) = k; vals(i) = v; used(i) = true; n += 1
  }

  def contains(k: Long): Boolean = {
    var i = slot(k)
    while (used(i)) {
      if (keys(i) == k) return true
      i = (i + 1) & (cap - 1)
    }
    false
  }

  /** Value for `k`, or `default` when absent — one probe, no boxing. */
  def getOrElse(k: Long, default: Long): Long = {
    var i = slot(k)
    while (used(i)) {
      if (keys(i) == k) return vals(i)
      i = (i + 1) & (cap - 1)
    }
    default
  }

  private def grow(): Unit = {
    val ok = keys; val ov = vals; val ou = used; val oc = cap
    cap <<= 1
    keys = new Array[Long](cap)
    vals = new Array[Long](cap)
    used = new Array[Boolean](cap)
    n = 0
    var i = 0
    while (i < oc) {
      if (ou(i)) put(ok(i), ov(i))
      i += 1
    }
  }
}

/** EXACT distinct-label set as a native Catalyst aggregate —
  * `graft_label_set(labels_array | label)` returns the unsigned-sorted
  * distinct labels (SURVEY §2.10's "huge-cardinality distinct as a
  * TypedImperativeAggregate"; the reference's `vol.image.unique`,
  * image/__init__.py:360-401, materializes the cutout then
  * np.unique's it).
  *
  * Why an aggregate and not explode+distinct: the explode shuffles
  * one row PER (chunk, label) occurrence and the distinct adds an
  * exchange keyed on label; this agg unions each chunk's codec-level
  * labels() array into a per-partition primitive hash set (map-side
  * partial), so only the per-partition DISTINCT sets cross the wire
  * once — at 100 TB the shuffle is bounded by true label cardinality,
  * not by chunk×label occurrence count. Complements the sketch aggs:
  * graft_kmv/HLL estimate, this one is exact (sorted-set output, the
  * reference's unique() contract). Plans as ObjectHashAggregate; the
  * buffer serializes only at shuffle boundaries.
  */
case class LabelSetAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongHashSet] {

  // analysis-time validation goes through checkInputDataTypes so a
  // mistyped argument surfaces as an AnalysisException with position
  // info, not a raw constructor throw (r15 advisor); fromArray is lazy
  // because dataType is not trustworthy until analysis accepts it
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) | LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "graft_label_set needs array<bigint> or bigint, got " +
            other.catalogString)
    }

  private lazy val fromArray: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def createAggregationBuffer(): LongHashSet = new LongHashSet()

  override def update(buf: LongHashSet, input: InternalRow): LongHashSet = {
    val v = child.eval(input)
    if (v != null) {
      if (fromArray) {
        val arr = v.asInstanceOf[ArrayData]
        var i = 0
        val n = arr.numElements()
        // the accepted type admits containsNull arrays; getLong on a
        // null slot would read 0 and invent a spurious label
        while (i < n) {
          if (!arr.isNullAt(i)) buf.add(arr.getLong(i))
          i += 1
        }
      } else buf.add(v.asInstanceOf[Long])
    }
    buf
  }

  override def merge(b1: LongHashSet, b2: LongHashSet): LongHashSet = {
    val arr = b2.toArray
    var i = 0
    while (i < arr.length) { b1.add(arr(i)); i += 1 }
    b1
  }

  override def eval(buf: LongHashSet): Any = {
    // unsigned sort (uint64 label convention, core/ShardCodec O1):
    // flip the sign bit, sort signed, flip back
    val arr = buf.toArray
    var i = 0
    while (i < arr.length) { arr(i) = arr(i) ^ Long.MinValue; i += 1 }
    java.util.Arrays.sort(arr)
    i = 0
    while (i < arr.length) { arr(i) = arr(i) ^ Long.MinValue; i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: LongHashSet): Array[Byte] = {
    val arr = buf.toArray
    val bb = ByteBuffer.allocate(4 + 8 * arr.length)
    bb.putInt(arr.length)
    var i = 0
    while (i < arr.length) { bb.putLong(arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongHashSet = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new LongHashSet(math.max(64, n * 2))
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LabelSetAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LabelSetAgg =
    copy(inputAggBufferOffset = newOffset)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_label_set"
}

object LabelSetAgg {
  /** FunctionRegistry builder: graft_label_set(labels). */
  def build(args: Seq[Expression]): Expression = {
    require(args.length == 1, "graft_label_set(labels) takes 1 argument")
    LabelSetAgg(args.head)
  }
}

package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** `topk_min(ord_struct, k)` — bounded-heap top-k aggregate.
  *
  * Keeps the k SMALLEST values of `ord_struct` under lexicographic
  * struct ordering (encode "descending" by negating a numeric field and
  * carrying the original alongside; later fields are the tie-break).
  * Returns the retained structs as a sorted array.
  *
  * WHY: the idiomatic rank-per-group top-k
  * (`row_number().over(Window.partitionBy(g).orderBy(o)) <= k`) must
  * shuffle EVERY row to its group's partition and fully sort there —
  * at 100 TB that is a full-data shuffle + sort to keep k rows per
  * group. This aggregate is a TypedImperativeAggregate, so Spark runs
  * it with map-side partial aggregation: each input partition reduces
  * to ≤ k rows per group in a fixed-size heap, the shuffle moves only
  * those, and merge folds heaps. Same answer, shuffle volume
  * k·groups·partitions instead of all rows. See
  * RelationalOps.q7bTopkAgg for the operator twin proving result parity
  * with the window formulation.
  *
  * Determinism: the caller makes the struct ordering total (include a
  * unique tie-break field), which the q7 shapes already do — so
  * partial/merge order can never change the result. Nulls inside
  * ordering fields sort FIRST (SQL NULLS FIRST ascending); top-level
  * null structs are ignored like every SQL aggregate input.
  */
case class TopKMinAgg(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]] {

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "topk_min"

  private lazy val k: Int = {
    require(kExpr.foldable, "topk_min: k must be a literal")
    kExpr.eval().asInstanceOf[Number].intValue()
  }

  private lazy val structType = child.dataType.asInstanceOf[StructType]

  /** Recursive comparator over public row accessors — no dependence on
    * Catalyst's internal ordering factories. Supports the atomic types
    * the engine's sort keys use, plus nested structs.
    */
  private def cmpFor(dt: DataType): (Any, Any) => Int = dt match {
    case LongType | TimestampType =>
      (a, b) => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case IntegerType | DateType =>
      (a, b) => Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
    case DoubleType =>
      (a, b) => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case FloatType =>
      (a, b) => java.lang.Float.compare(a.asInstanceOf[Float], b.asInstanceOf[Float])
    case StringType =>
      (a, b) => a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
    case BooleanType =>
      (a, b) => java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
    case st: StructType =>
      val fields = st.fields.map(f => (f.dataType, cmpFor(f.dataType)))
      (a, b) => {
        val (x, y) = (a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])
        var i = 0
        var r = 0
        while (r == 0 && i < fields.length) {
          val (fdt, fc) = fields(i)
          val (xn, yn) = (x.isNullAt(i), y.isNullAt(i))
          r = if (xn && yn) 0
          else if (xn) -1 // NULLS FIRST ascending
          else if (yn) 1
          else fc(x.get(i, fdt), y.get(i, fdt))
          i += 1
        }
        r
      }
    case other =>
      throw new IllegalArgumentException(s"topk_min: unsupported sort type $other")
  }

  private lazy val rowCmp: (Any, Any) => Int = cmpFor(structType)
  /** Max-heap of the retained k (largest on top, evicted first). */
  private lazy val heapOrd: Ordering[InternalRow] =
    (a: InternalRow, b: InternalRow) => rowCmp(a, b)

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    mutable.PriorityQueue.empty[InternalRow](heapOrd)

  override def update(
      buf: mutable.PriorityQueue[InternalRow],
      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (buf.size < k) buf.enqueue(row.copy()) // eval may reuse the row
      else if (rowCmp(row, buf.head) < 0) { buf.dequeue(); buf.enqueue(row.copy()) }
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[InternalRow],
      other: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    other.foreach { row =>
      if (buf.size < k) buf.enqueue(row)
      else if (rowCmp(row, buf.head) < 0) { buf.dequeue(); buf.enqueue(row) }
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(buf.toArray.sorted(heapOrd).toArray[Any])

  private lazy val proj = UnsafeProjection.create(structType)

  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(buf.size)
    buf.foreach { row =>
      val u = proj(row)
      dos.writeInt(u.getSizeInBytes)
      dos.write(u.getBytes)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val dis = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = dis.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = dis.readInt()
      val arr = new Array[Byte](len)
      dis.readFully(arr)
      val row = new UnsafeRow(structType.length)
      row.pointTo(arr, len)
      buf.enqueue(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

/** The Misra-Gries buffer transitions, factored out of [[MgSketchAgg]]
  * so its streaming consumers ([[graft.streaming.HeavyHittersStream]]
  * merges per-batch summaries into per-window state) and the
  * entry-valued variant ([[MgEntriesAgg]]) run the IDENTICAL update and
  * PODS'12 merge — one kernel, no drift between the batch aggregate
  * and the ingest-edge monitor.
  */
object MgKernel {

  def decrementAll(buf: mutable.LongMap[Long], by: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[Long]
    buf.foreach { case (k, v) =>
      if (v <= by) dead += k else buf(k) = v - by
    }
    dead.foreach(buf.remove)
  }

  /** One arriving element: present → +1; room → insert at 1; full →
    * decrement ALL by 1 dropping zeros.
    */
  def offer(buf: mutable.LongMap[Long], key: Long, cap: Int): Unit = {
    val cur = buf.getOrElse(key, 0L)
    if (cur > 0L) buf(key) = cur + 1L
    else if (buf.size < cap) buf(key) = 1L
    else decrementAll(buf, 1L)
  }

  /** Fold `other`'s (key, count) entries into `buf` and re-trim to
    * `cap` by subtracting the (cap+1)-th largest count — the PODS'12
    * mergeable form. `other` may be another summary OR exact per-key
    * counts (a summary with zero error), so this is also the
    * count-weighted update the streaming monitor feeds with its
    * per-batch distributed summaries.
    */
  def merge(
      buf: mutable.LongMap[Long],
      other: Iterator[(Long, Long)], cap: Int): Unit = {
    other.foreach { case (k, v) => buf(k) = buf.getOrElse(k, 0L) + v }
    if (buf.size > cap) {
      val counts = buf.valuesIterator.toArray
      java.util.Arrays.sort(counts)
      decrementAll(buf, counts(counts.length - cap - 1))
    }
  }
}

/** `mg_sketch(key: bigint, capacity)` — Misra-Gries frequent-items
  * summary over a long key, returning the retained candidate keys
  * (sorted, ≤ capacity of them).
  *
  * WHY: exact heavy hitters via `GROUP BY key HAVING count > n/θ⁻¹`
  * shuffles one partial per DISTINCT key per partition and builds
  * hash-aggregate state proportional to the key cardinality — at 100 TB
  * with billions of tail keys that state is the bottleneck, not the
  * answer (which is ≤ θ⁻¹ rows). This summary is FIXED-SIZE: each
  * partition reduces to ≤ capacity (key, count) pairs whatever the
  * cardinality, the shuffle moves only those, and merges fold summaries
  * pairwise. The classic guarantee (Misra & Gries 1982; merge form
  * Agarwal et al., "Mergeable Summaries", PODS'12): every key with true
  * frequency > n/(capacity+1) SURVIVES in the summary — so with
  * capacity ≥ θ⁻¹ the result is a SUPERSET of the θ-heavy hitters, and
  * a second exact counting pass over just those candidates makes the
  * final answer exact (PipelineOps.eventsHeavyHitters). Retained
  * COUNTS are under-estimates and intermediate contents depend on
  * partitioning; neither leaks into the two-phase result, which is
  * exact by the superset guarantee alone.
  *
  * update: present → +1; room → insert at 1; full → decrement ALL by 1,
  * dropping zeros (amortized O(1): each decrement cancels a prior
  * increment). merge: sum counts keywise; if over capacity, subtract
  * the (capacity+1)-th largest count from everything and drop ≤ 0 —
  * the PODS'12 mergeable form, preserving the error bound n/(cap+1).
  */
case class MgSketchAgg(
    child: Expression,
    capExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  override def children: Seq[Expression] = Seq(child, capExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "mg_sketch"

  /** Analysis-time validation (r12 advisory): without it a STRING key or
    * a non-integral capacity surfaced as an executor-side
    * ClassCastException instead of an AnalysisException, unlike every
    * built-in aggregate.
    */
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => capExpr.dataType match {
      case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"mg_sketch: capacity must be integral, got ${other.catalogString}")
    }
    case other => TypeCheckResult.TypeCheckFailure(
      s"mg_sketch: key must be BIGINT or INT, got ${other.catalogString}")
  }

  /** INT keys widen to the LONG summary domain once per row. */
  private lazy val widenInt = child.dataType == IntegerType

  private lazy val cap: Int = {
    require(capExpr.foldable, "mg_sketch: capacity must be a literal")
    val c = capExpr.eval().asInstanceOf[Number].intValue()
    require(c > 0, "mg_sketch: capacity must be positive")
    c
  }

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(
      buf: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key =
        if (widenInt) v.asInstanceOf[Int].toLong else v.asInstanceOf[Long]
      MgKernel.offer(buf, key, cap)
    }
    buf
  }

  override def merge(
      buf: mutable.LongMap[Long],
      other: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    // PODS'12 mergeable form (MgKernel.merge): entries TIED with the
    // pivot hit exactly 0 and are removed, so the summary can shrink
    // below cap after a merge; the n/(cap+1) survival bound is
    // unaffected because a true θ-heavy key's count always strictly
    // exceeds the pivot's share of the mass it absorbed.
    MgKernel.merge(buf, other.iterator, cap)
    buf
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    val keys = buf.keysIterator.toArray
    java.util.Arrays.sort(keys)
    new GenericArrayData(keys)
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (k, v) => bb.putLong(k); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf(bb.getLong()) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), capExpr = newChildren(1))
}

/** `mg_entries(key: bigint, capacity)` — [[MgSketchAgg]] with its
  * retained (key, cnt) ENTRIES exposed, as a key-sorted
  * array<struct<key:bigint, cnt:bigint>>.
  *
  * The entry counts are the part [[MgSketchAgg]] deliberately hides
  * from the two-phase batch answer (they are under-estimates whose
  * values depend on partitioning) — but they are exactly what an
  * INCREMENTAL consumer must carry: a streaming monitor cannot run the
  * exact second pass over events it already discarded, so its state IS
  * the summary, counts included, merged batch-over-batch in the
  * PODS'12 form ([[graft.streaming.HeavyHittersStream]]) and read out
  * with the explicit error bracket est ≤ true ≤ est + (n−m)/(cap+1).
  * Same [[MgKernel]] transitions as `mg_sketch`, so the candidate-set
  * guarantee (every > n/(cap+1) key survives) transfers unchanged.
  */
case class MgEntriesAgg(
    child: Expression,
    capExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  override def children: Seq[Expression] = Seq(child, capExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "mg_entries"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => capExpr.dataType match {
      case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"mg_entries: capacity must be integral, got ${other.catalogString}")
    }
    case other => TypeCheckResult.TypeCheckFailure(
      s"mg_entries: key must be BIGINT or INT, got ${other.catalogString}")
  }

  private lazy val widenInt = child.dataType == IntegerType

  private lazy val cap: Int = {
    require(capExpr.foldable, "mg_entries: capacity must be a literal")
    val c = capExpr.eval().asInstanceOf[Number].intValue()
    require(c > 0, "mg_entries: capacity must be positive")
    c
  }

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(
      buf: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key =
        if (widenInt) v.asInstanceOf[Int].toLong else v.asInstanceOf[Long]
      MgKernel.offer(buf, key, cap)
    }
    buf
  }

  override def merge(
      buf: mutable.LongMap[Long],
      other: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    MgKernel.merge(buf, other.iterator, cap)
    buf
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    val keys = buf.keysIterator.toArray
    java.util.Arrays.sort(keys)
    new GenericArrayData(
      keys.map(k => InternalRow(k, buf(k)): Any))
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (k, v) => bb.putLong(k); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf(bb.getLong()) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgEntriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgEntriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), capExpr = newChildren(1))
}

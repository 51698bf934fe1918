package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Shared Count-Min hashing: row `d` maps a 64-bit token hash to a
  * column in [0, width) via a splitmix64 finalizer over the hash
  * xor'd with a fixed per-row seed — deterministic across JVMs and
  * partitionings (no Random anywhere), so sketches built anywhere
  * merge coherently and probes recompute the identical cells.
  */
private[graft] object CountMin {
  val seeds: Array[Long] = Array(
    0x9e3779b97f4a7c15L, 0xbf58476d1ce4e5b9L,
    0x94d049bb133111ebL, 0x2545f4914f6cdd1dL,
    0x6a09e667f3bcc909L, 0xbb67ae8584caa73bL,
    0x3c6ef372fe94f82bL, 0xa54ff53a5f1d36f1L)

  def mix(h0: Long): Long = {
    var h = h0
    h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
    h ^= h >>> 27; h *= 0x94d049bb133111ebL
    h ^= h >>> 31
    h
  }

  def cell(h: Long, d: Int, width: Int): Int =
    ((mix(h ^ seeds(d)) >>> 1) % width).toInt
}

/** Native mergeable Count-Min sketch aggregate: folds a column of
  * 64-bit token hashes into a depth×width counter matrix per group —
  * the sublinear heavy-hitters / frequency-estimate primitive next to
  * HLL++ (distinct) and t-digest (quantiles) in the sketch family.
  *
  * Why native: the buffer is MERGEABLE (counters add), so map-side
  * partial aggregation ships depth×width longs per group instead of
  * the token stream — at 100 TB a per-source frequency table over an
  * unbounded vocabulary becomes a fixed 32 KB (4×1024) buffer, and
  * the merge is one vector add. Overestimate-only guarantee: for any
  * token, estimate ≥ true count, and ≤ true + ε·N with probability
  * 1−δ (ε = e/width, δ = e^−depth) — the classic CM bound.
  *
  * Returns the sketch as `array<bigint>` (row-major depth×width);
  * probe it with [[CmEstimate]] under the SAME depth/width.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int = 4,
    width: Int = 1024,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= CountMin.seeds.length,
    s"count_min_agg depth must be in [1, ${CountMin.seeds.length}], got $depth")
  require(width >= 2, s"count_min_agg width must be >= 2, got $width")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var d = 0
      while (d < depth) {
        buffer(d * width + CountMin.cell(h, d, width)) += 1
        d += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(depth * width)(bb.getLong())
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"count_min_agg expects a BIGINT token-hash column (e.g. xxhash64(token)), " +
        s"got ${child.dataType.simpleString}")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "count_min_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}

/** Point estimate from a [[CountMinAgg]] sketch: min over the depth
  * rows of the token's cells — recomputed with the same deterministic
  * hashing, so any sketch probes anywhere. Probe-side scalar (runs
  * over estimate requests, not the token stream), so CodegenFallback
  * is fine here.
  */
case class CmEstimate(
    sketch: Expression,
    tokenHash: Expression,
    depth: Int = 4,
    width: Int = 1024)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(sketch, tokenHash)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "cm_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    if (sketch.dataType == ArrayType(LongType, containsNull = false) ||
        sketch.dataType == ArrayType(LongType, containsNull = true)) {
      if (tokenHash.dataType == LongType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"cm_estimate expects a BIGINT token hash, got ${tokenHash.dataType.simpleString}")
    } else TypeCheckResult.TypeCheckFailure(
      s"cm_estimate expects an array<bigint> sketch, got ${sketch.dataType.simpleString}")

  override def eval(input: InternalRow): Any = {
    val s = sketch.eval(input)
    val t = tokenHash.eval(input)
    if (s == null || t == null) null
    else {
      val arr = s.asInstanceOf[ArrayData]
      require(arr.numElements() == depth * width,
        s"cm_estimate: sketch has ${arr.numElements()} cells, expected depth*width = ${depth * width}")
      val h = t.asInstanceOf[Long]
      var best = Long.MaxValue
      var d = 0
      while (d < depth) {
        val idx = d * width + CountMin.cell(h, d, width)
        // containsNull=true is accepted (parquet round-trips widen the
        // type), but an actually-null cell means a corrupted sketch: an
        // ArrayData.getLong on it would silently read 0 and break the
        // overestimate-only guarantee, so fail loudly instead.
        require(!arr.isNullAt(idx),
          s"cm_estimate: sketch cell $idx is NULL — not a count_min_agg sketch")
        val c = arr.getLong(idx)
        if (c < best) best = c
        d += 1
      }
      best
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmEstimate =
    copy(sketch = newChildren(0), tokenHash = newChildren(1))
}

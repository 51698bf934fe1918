package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Shared Bloom bit addressing: hash function j maps a 64-bit key to a
  * bit in [0, numBits) via the same splitmix64 finalizer + fixed seed
  * family as Count-Min (deterministic across JVMs and partitionings —
  * no Random), so filters built anywhere OR together coherently and
  * probes recompute the identical bits.
  */
private[graft] object Bloom {
  def bit(h: Long, j: Int, numBits: Int): Int =
    ((CountMin.mix(h ^ CountMin.seeds(j)) >>> 1) % numBits).toInt
}

/** Native mergeable Bloom-filter aggregate: folds a column of 64-bit
  * key hashes into a fixed bitset per group — the set-MEMBERSHIP
  * sketch next to HLL++ (distinct), t-digest (quantiles) and Count-Min
  * (frequency). The decontamination primitive at corpus scale: build
  * the filter over the (small) benchmark/eval side once, then
  * membership-test 100 TB of training text with a broadcast byte
  * array and zero shuffle of the corpus.
  *
  * Why native: the buffer is MERGEABLE (bitsets OR), so map-side
  * partial aggregation ships numBits/8 bytes per group instead of the
  * key stream, and the merge is one vector OR. Guarantees: NO false
  * negatives ever (every inserted key probes true); false-positive
  * rate ≈ (1 − e^(−k·n/m))^k for n keys, m bits, k hashes — size m
  * ≥ 16·n for a comfortably sub-1% rate at k=4.
  *
  * Returns the filter as `array<bigint>` (numBits/64 words); probe it
  * with [[BloomMightContain]] under the SAME numBits/numHashes.
  */
case class BloomAgg(
    child: Expression,
    numBits: Int = 65536,
    numHashes: Int = 4,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64 && numBits % 64 == 0,
    s"bloom_agg numBits must be a positive multiple of 64, got $numBits")
  require(numHashes >= 1 && numHashes <= CountMin.seeds.length,
    s"bloom_agg numHashes must be in [1, ${CountMin.seeds.length}], got $numHashes")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < numHashes) {
        val b = Bloom.bit(h, j, numBits)
        buffer(b >>> 6) |= 1L << (b & 63)
        j += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
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
    Array.fill(numBits / 64)(bb.getLong())
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_agg expects a BIGINT key-hash column (e.g. xxhash64(key)), " +
        s"got ${child.dataType.simpleString}")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)
}

/** Membership probe of a [[BloomAgg]] filter: true iff every one of
  * the key's bits is set — recomputed with the same deterministic
  * hashing, so any filter probes anywhere. "true" means might-be-
  * member (false positives possible at the designed rate); "false"
  * is definite non-membership. Probe-side scalar over the corpus; a
  * per-row bitset lookup against a broadcast array.
  */
case class BloomMightContain(
    filter: Expression,
    keyHash: Expression,
    numBits: Int = 65536,
    numHashes: Int = 4)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(filter, keyHash)
  override def nullable: Boolean = true
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    if (filter.dataType == ArrayType(LongType, containsNull = false) ||
        filter.dataType == ArrayType(LongType, containsNull = true)) {
      if (keyHash.dataType == LongType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"bloom_contains expects a BIGINT key hash, got ${keyHash.dataType.simpleString}")
    } else TypeCheckResult.TypeCheckFailure(
      s"bloom_contains expects an array<bigint> filter, got ${filter.dataType.simpleString}")

  override def eval(input: InternalRow): Any = {
    val f = filter.eval(input)
    val k = keyHash.eval(input)
    if (f == null || k == null) null
    else {
      val arr = f.asInstanceOf[ArrayData]
      require(arr.numElements() == numBits / 64,
        s"bloom_contains: filter has ${arr.numElements()} words, expected numBits/64 = ${numBits / 64}")
      val h = k.asInstanceOf[Long]
      var j = 0
      while (j < numHashes) {
        val b = Bloom.bit(h, j, numBits)
        require(!arr.isNullAt(b >>> 6),
          s"bloom_contains: filter word ${b >>> 6} is NULL — not a bloom_agg filter")
        if ((arr.getLong(b >>> 6) & (1L << (b & 63))) == 0L) return false
        j += 1
      }
      true
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomMightContain =
    copy(filter = newChildren(0), keyHash = newChildren(1))
}

package graft.expressions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native mergeable Theta-sketch aggregate (Datasketches theta family
  * — the public KMV/theta algorithm): folds a column of 64-bit key
  * hashes into one compact sketch per group. Theta completes the
  * sketch shelf: HLL++ answers DISTINCT-COUNT only; theta sketches
  * additionally support SET OPERATIONS (union / intersection /
  * A-not-B) over already-built sketches — the cross-corpus audit
  * primitive. Estimated |A∩B| between two 100 TB corpora costs two
  * independent linear scans (each map-side-partial, one lgK-sized
  * state per group) plus a driver-side set operation on kilobyte
  * artifacts; the vocabularies themselves never shuffle and never
  * meet.
  *
  * Updates are SET-semantics (duplicates are no-ops), so no upstream
  * `distinct` shuffle is needed — feed the raw token stream.
  * Deterministic for a fixed input SET under the library's default
  * seed: the retained-hash set is a pure function of the input keys,
  * so any partitioning/ordering yields the same compact sketch.
  *
  * Returns compact-ordered sketch BYTES; combine with [[ThetaSetOp]]
  * and read with [[ThetaEstimate]].
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 14,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  require(lgK >= 4 && lgK <= 26, s"theta_agg lgK must be in [4, 26], got $lgK")

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(b1: Union, b2: Union): Union = {
    b1.union(b2.getResult)
    b1
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Sketch.wrap(Memory.wrap(bytes)))
    u
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_agg expects a BIGINT key-hash column (e.g. xxhash64(key)), " +
        s"got ${child.dataType.simpleString}")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)
}

/** Set operation over two [[ThetaSketchAgg]] sketches: `union`,
  * `intersect`, or `anotb` (A \ B), returning compact sketch bytes so
  * operations COMPOSE ((A∩B)\C, etc.). Scalar, CodegenFallback by
  * design: set ops run on rows that are already per-GROUP aggregates
  * (one row per source/corpus — model-sized), never on the corpus
  * scan path, so codegen would buy nothing (the plan-audit hot-path
  * rule is about per-input-row expressions).
  *
  * lgK must match the aggregate's (default 14 on both): the library's
  * OWN builder default is lgK 12, which would silently downsample
  * lgK-14 inputs — two exact 10k-term sketches would union into a
  * 4096-entry ESTIMATE instead of staying exact.
  */
case class ThetaSetOp(left: Expression, right: Expression, op: String,
    lgK: Int = 14)
  extends Expression with CodegenFallback {

  require(lgK >= 4 && lgK <= 26, s"theta_set_op lgK must be in [4, 26], got $lgK")

  require(ThetaSetOp.Ops.contains(op),
    s"theta_set_op op must be one of ${ThetaSetOp.Ops.mkString("/")}, got '$op'")

  override def children: Seq[Expression] = Seq(left, right)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = s"theta_$op"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_set_op expects two BINARY sketch columns, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) null
    else {
      val sa = Sketch.wrap(Memory.wrap(a.asInstanceOf[Array[Byte]]))
      val sb = Sketch.wrap(Memory.wrap(b.asInstanceOf[Array[Byte]]))
      op match {
        case "union" =>
          val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
          u.union(sa); u.union(sb); u.getResult.toByteArray
        case "intersect" =>
          SetOperation.builder().setLogNominalEntries(lgK).buildIntersection()
            .intersect(sa, sb).toByteArray
        case "anotb" =>
          SetOperation.builder().setLogNominalEntries(lgK).buildANotB()
            .aNotB(sa, sb).toByteArray
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSetOp =
    copy(left = newChildren(0), right = newChildren(1))
}

object ThetaSetOp {
  val Ops: Set[String] = Set("union", "intersect", "anotb")

  /** Helper for the function registry: op arrives as a string literal
    * expression, validated here so a bad op fails at plan time with
    * the expression name, not mid-job — the foldability check first,
    * or eval(null) on a real column throws Catalyst's unrelated
    * "cannot evaluate" instead of this message.
    */
  def opLit(e: Expression, fn: String): String = {
    require(e.foldable,
      s"$fn op must be a string LITERAL of ${Ops.mkString("/")}, got the " +
        s"non-foldable expression ${e.sql}")
    e.eval(null) match {
      case s: UTF8String if Ops.contains(s.toString) => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn op must be a literal of ${Ops.mkString("/")}, got $other")
    }
  }
}

/** Estimated distinct count of a theta sketch (the sketch's unbiased
  * estimator). Scalar over aggregated rows — same off-hot-path
  * rationale as [[ThetaSetOp]].
  */
case class ThetaEstimate(child: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_estimate expects a BINARY sketch column, got ${child.dataType.simpleString}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else Sketch.wrap(Memory.wrap(v.asInstanceOf[Array[Byte]])).getEstimate
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaEstimate =
    copy(child = newChildren.head)
}

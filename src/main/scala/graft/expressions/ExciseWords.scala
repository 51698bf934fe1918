package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native excision keep-pass: given a document's word array and its
  * SORTED DISJOINT cover intervals (array<struct<lo:int,hi:int>>,
  * 0-based inclusive word positions — the merged output of the
  * span/self-repeat excision marking stages), return the surviving
  * words re-joined with single spaces.
  *
  * Why a custom Catalyst Expression and not `filter`+`exists` (the
  * r15 shape this replaces): higher-order functions are
  * CodegenFallback — every word pays lambda interpretation, the
  * interval probe is O(words × intervals) per row (quadratic for a
  * doc with many short disjoint intervals), and the surrounding
  * operator drops out of whole-stage codegen. This expression is a
  * two-pointer merge — O(words + intervals) per row, one compiled
  * pass — relying on the caller's sorted-disjoint contract. The
  * removed-word COUNT is deliberately NOT an output: it equals
  * Σ(hi−lo+1) over the intervals and is cheaper as a relational
  * aggregate at interval-build time (also avoiding the struct-output
  * double-evaluation CollapseProject would inflict).
  *
  * Nulls: null words or null intervals → null (callers coalesce the
  * left-join miss to an empty interval array). Word elements are
  * never null (they come from split()).
  */
case class ExciseWords(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _),
          ArrayType(StructType(Array(
            StructField("lo", IntegerType, _, _),
            StructField("hi", IntegerType, _, _))), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"excise_words expects (array<string>, array<struct<lo:int,hi:int>>), " +
        s"got ${l.simpleString} and ${r.simpleString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "excise_words"

  def doExcise(wordsArr: ArrayData, iv: ArrayData): UTF8String = {
    val nW = wordsArr.numElements()
    val nIv = iv.numElements()
    // pre-extract interval bounds once per row (nIv is small — merged
    // disjoint intervals — while nW is the document length)
    val los = new Array[Int](nIv)
    val his = new Array[Int](nIv)
    var j = 0
    while (j < nIv) {
      val r = iv.getStruct(j, 2)
      // the function is in the public SQL catalog: a null interval
      // element type-checks, so fail comprehensibly, not with an NPE
      // from compiled codegen (internal callers build intervals via
      // collect_list, which never emits null elements)
      if (r == null) throw new IllegalArgumentException(
        s"excise_words: interval array contains a null element at index $j")
      los(j) = r.getInt(0); his(j) = r.getInt(1)
      // the two-pointer merge is only correct for sorted, disjoint
      // intervals; this is a public SQL-catalog function, so a caller
      // violating the contract must fail loudly (like null elements do),
      // not get silently corrupted text — O(nIv) check, negligible next
      // to the word pass
      if (his(j) < los(j)) throw new IllegalArgumentException(
        s"excise_words: interval [${los(j)},${his(j)}] at index $j has hi < lo")
      if (j > 0 && los(j) <= his(j - 1)) throw new IllegalArgumentException(
        s"excise_words: intervals must be sorted and disjoint; " +
          s"[${los(j)},${his(j)}] at index $j overlaps or precedes " +
          s"[${los(j - 1)},${his(j - 1)}]")
      j += 1
    }
    val kept = new Array[UTF8String](nW)
    var k = 0; var i = 0; j = 0
    while (i < nW) {
      while (j < nIv && his(j) < i) j += 1
      if (!(j < nIv && los(j) <= i)) { kept(k) = wordsArr.getUTF8String(i); k += 1 }
      i += 1
    }
    UTF8String.concatWs(ExciseWords.Sep,
      (if (k == nW) kept else java.util.Arrays.copyOf(kept, k)): _*)
  }

  override def nullSafeEval(w: Any, iv: Any): Any =
    doExcise(w.asInstanceOf[ArrayData], iv.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // genuine codegen (not CodegenFallback): the row stays inside
    // whole-stage codegen and pays one virtual call into the compiled
    // two-pointer loop — no per-element interpretation
    val ref = ctx.addReferenceObj("exciseWords", this, classOf[ExciseWords].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.doExcise($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ExciseWords =
    copy(left = newLeft, right = newRight)
}

object ExciseWords {
  private val Sep = UTF8String.fromString(" ")
}

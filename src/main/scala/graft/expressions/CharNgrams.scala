package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All character n-grams of a text column as one in-row array —
  * the language-ID trigram stream (trigramTf / the trigram_tf stored
  * build) without the interpreted per-position HOF.
  *
  * Why an expression: the r18 form exploded
  * `transform(sequence(1, length-2), i -> substr(text, i, 3))` —
  * a CodegenFallback lambda PER CHARACTER, and each interpreted
  * `substr` re-scans the string from its start to find the i-th
  * code point (O(len²) per document on top of the interpretation).
  * This walks the UTF-8 byte stream ONCE, recording code-point
  * boundaries, and slices each gram by byte range.
  *
  * Semantics — identical to `substr(text, i, n)` for i = 1..len-n+1
  * (code-POINT indexed, exactly SQL substring's convention): each
  * gram is the byte range between code-point boundaries i-1 and
  * i-1+n, the same bytes `UTF8String.substringSQL` extracts.
  * Fewer than n code points → empty array.
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_ngrams expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CharNgrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.CharNgrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

object CharNgrams {
  private val EMPTY: ArrayData = new GenericArrayData(Array.empty[Any])

  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    // code-point start offsets (one pass over the byte stream)
    val offs = new Array[Int](text.numChars() + 1)
    var c = 0
    var b = 0
    while (b < bytes.length) {
      offs(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offs(c) = bytes.length
    val m = c - n + 1
    if (m <= 0) EMPTY
    else {
      val out = new Array[Any](m)
      var i = 0
      while (i < m) {
        out(i) = UTF8String.fromBytes(bytes, offs(i), offs(i + n) - offs(i))
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

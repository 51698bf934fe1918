package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a text column as ONE in-row array — the
  * native replacement for the explode → per-doc window(lead) pipeline
  * the n-gram producer used through r18.
  *
  * Why an expression and not the window form: the window's
  * `partitionBy(doc_id).orderBy(pos)` costs an Exchange PLUS a sort of
  * the ENTIRE exploded word stream (every word occurrence of the
  * corpus crosses the wire and gets sorted) before the first shingle
  * exists — pure plumbing, since every gram is a function of one
  * document row. This expression builds the grams where the row
  * already is: the n-gram pass becomes a shuffle-free scan projection,
  * and the downstream per-doc/per-gram aggregations get map-side
  * partials instead of inheriting the window's raw-row exchange. Why
  * not the `transform ∘ slice ∘ array_join` HOF: per-element lambda
  * interpretation (CodegenFallback on every word) — the r10 bench put
  * it at 3-5× the window form; this loop is primitive UTF8String
  * work invoked once per row from inside whole-stage codegen.
  *
  * Semantics — BIT-identical to the retired window pipeline, pinned by
  * DedupSpec (native ≡ window reference on the corpus + edge cases):
  * tokens are `split(trim(text), "\\s+")` with Spark's own
  * `UTF8String.trim` (strips 0x20 ONLY — not tabs) and
  * `UTF8String.split(pattern, -1)` (so a leading tab yields the same
  * leading empty token the SQL form produces); shingle i is words
  * i..i+n-1 joined by single spaces via `UTF8String.concatWs` (the
  * ConcatWs kernel the window form's concat_ws evaluated); documents
  * with fewer than n tokens yield an EMPTY array (posexplode of it
  * emits nothing, exactly like the window form's complete-gram
  * filter). Position = array index under `posexplode`, 0-based like
  * the retired posexplode-of-words pos.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[UTF8String], n)

  // Stays inside whole-stage codegen via a static call — the per-row
  // work is the split/concat loop itself (same pattern as Spark's own
  // regexp expressions calling into their Pattern helpers).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.WordNgrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  private val SPACE = UTF8String.fromString(" ")
  private val WS = UTF8String.fromString("\\s+")
  private val EMPTY: ArrayData = new GenericArrayData(Array.empty[Any])

  /** All complete word n-grams of `text`, in position order. Exactly
    * `split(trim(text), "\\s+")` tokens (Spark kernels, not
    * `java.lang.String` ones — String.trim strips all control chars,
    * UTF8String.trim strips spaces only) joined n-at-a-time with " ".
    */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val ws = text.trim().split(WS, -1)
    val m = ws.length - n + 1
    if (m <= 0) EMPTY
    else {
      val out = new Array[Any](m)
      val buf = new Array[UTF8String](n)
      var i = 0
      while (i < m) {
        var j = 0
        while (j < n) { buf(j) = ws(i + j); j += 1 }
        out(i) = UTF8String.concatWs(SPACE, buf: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

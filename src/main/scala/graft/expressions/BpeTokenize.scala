package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE tokenization of a text column under a trained merge list
  * (graft.operators.Bpe — Sennrich 2016): whitespace-split words, each
  * encoded by greedily applying the lowest-ranked applicable merge.
  * Returns the token array; `size(...)` of it is the exact BPE token
  * count a pretraining budget wants.
  *
  * The merges ride IN the expression (a model-sized case-class field,
  * serialized once per task with the plan — the same driver-traffic
  * budget as the ANN codebook literals), so tokenization is one
  * shuffle-free scan projection. CodegenFallback is deliberate: the
  * encode loop is data-dependent iterative string work — the per-row
  * cost is the merge loop itself, not interpreter overhead, and
  * generated Java for it would be the same loop. Registered as
  * `bpe_tokenize(text, merges)` by [[graft.GraftExtensions]], merges
  * as an array<string> literal of "left right" pairs in rank order
  * (symbols never contain whitespace — they come from
  * whitespace-split words — so the space separator is unambiguous).
  */
case class BpeTokenize(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_tokenize expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val rank: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = Seq.newBuilder[UTF8String]
    text.trim.split("\\s+").foreach { w =>
      if (w.nonEmpty)
        graft.operators.Bpe.encodeWith(w, rank)
          .foreach(t => out += UTF8String.fromString(t))
    }
    new GenericArrayData(out.result().toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenize =
    copy(child = newChild)
}

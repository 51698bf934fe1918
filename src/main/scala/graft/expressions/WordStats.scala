package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document word statistics as ONE in-row struct —
  * (tot, mx, nstop) = (token count, max single-token multiplicity,
  * total stop-token occurrences) over `split(trim(text), "\\s+")`.
  *
  * Why an expression: the quality-gate family (q74/q78/q158, q60's
  * word arm) needs these three per-doc facts, and every document's
  * facts are a function of its own row. The r18 formulation exploded
  * the corpus word stream and aggregated twice (groupBy(doc, word) →
  * groupBy(doc)): two exchanges of every word occurrence, then a join
  * back to the doc row — pure plumbing for row-local math. The HOF
  * row form (`transform(array_distinct(ws), w → size(filter(ws, …)))`)
  * is O(distinct·n) per row AND CodegenFallback-interpreted per
  * element. This expression is one O(n) hashmap pass per row invoked
  * from inside whole-stage codegen.
  *
  * Semantics — identical to the exploded aggregation, pinned by
  * FunctionsSpec (native ≡ aggregate on the corpus + edges): tokens
  * are Spark's `split(trim(text), "\\s+")` (UTF8String kernels —
  * trim strips 0x20 only; a leading tab yields a leading empty token,
  * which counts like any other, exactly as the exploded form counted
  * it); stop matching is exact UTF8String equality against the baked
  * literal list; null text → null struct (the exploded form emitted
  * no rows for the doc, so its left-joined stats were null too).
  */
case class WordStats(child: Expression, stops: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_stats expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("tot", LongType, nullable = false),
    StructField("mx", LongType, nullable = false),
    StructField("nstop", LongType, nullable = false)))

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](stops.size * 2)
    stops.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  /** One counting pass; called from generated code via reference. */
  def compute(text: UTF8String): InternalRow = {
    val ws = text.trim().split(WordStats.WS, -1)
    val counts = new java.util.HashMap[UTF8String, Long](ws.length * 2)
    var nstop = 0L
    var i = 0
    while (i < ws.length) {
      val w = ws(i)
      counts.merge(w, 1L, (a, b) => a + b)
      if (stopSet.contains(w)) nstop += 1
      i += 1
    }
    var mx = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next(); if (c > mx) mx = c }
    new GenericInternalRow(Array[Any](ws.length.toLong, mx, nstop))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordStats", this, classOf[WordStats].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordStats =
    copy(child = newChild)
}

object WordStats {
  private[expressions] val WS = UTF8String.fromString("\\s+")
}

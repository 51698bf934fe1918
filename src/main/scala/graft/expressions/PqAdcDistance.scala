package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native ADC (asymmetric distance computation) scorer for product-
  * quantized vectors: given a per-query lookup table `tbl[j][c]` (the
  * squared distance from the query's j-th subvector to centroid c of
  * subspace j's codebook) and a candidate's code word `codes[j]`, the
  * approximate squared distance is Σ_j tbl[j][codes[j]] — `m` array
  * lookups and adds per candidate instead of a `dim`-element float
  * loop. This is THE inner loop of PQ search (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search"): at 100 TB the coded
  * corpus is dim/m·8× smaller than raw vectors and the scan cost per
  * candidate drops the same way.
  *
  * Why a custom Catalyst Expression: the equivalent higher-order-
  * function form (`aggregate(sequence(...), element_at(element_at(...)))`)
  * is CodegenFallback — per-candidate lambda interpretation exactly
  * where the operator must stay tight. This emits a primitive loop
  * inside WholeStageCodegen (same rationale as [[CosineSimilarity]]).
  *
  * Contract: result is Σ over j < min(|tbl|, |codes|); a null input
  * (or null table row / code element) yields null; a code outside
  * tbl[j]'s bounds raises a clear error — the expression is
  * registered as a session SQL function, so it must not trust its
  * arguments the way the in-library code assigner can be trusted
  * (an unchecked UnsafeArrayData offset read would return heap
  * garbage instead of failing). Spec-pinned bit-identical to the HOF
  * formulation in AnnSpec.
  */
case class PqAdcDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects (array<array<double>>, array<int>), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(t: Any, c: Any): Any = {
    val tbl = t.asInstanceOf[ArrayData]
    val codes = c.asInstanceOf[ArrayData]
    val m = math.min(tbl.numElements(), codes.numElements())
    var s = 0.0
    var j = 0
    while (j < m) {
      if (tbl.isNullAt(j) || codes.isNullAt(j)) return null
      val row = tbl.getArray(j)
      val code = codes.getInt(j)
      if (code < 0 || code >= row.numElements()) {
        throw new IllegalArgumentException(
          s"pq_adc: code $code out of bounds for table row $j " +
            s"(${row.numElements()} centroids)")
      }
      s += row.getDouble(code)
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, c) => {
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val row = ctx.freshName("row")
      val code = ctx.freshName("code")
      s"""
         |int $m = java.lang.Math.min($t.numElements(), $c.numElements());
         |double $s = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  if ($t.isNullAt($j) || $c.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  org.apache.spark.sql.catalyst.util.ArrayData $row = $t.getArray($j);
         |  int $code = $c.getInt($j);
         |  if ($code < 0 || $code >= $row.numElements()) {
         |    throw new IllegalArgumentException(
         |      "pq_adc: code " + $code + " out of bounds for table row " + $j +
         |      " (" + $row.numElements() + " centroids)");
         |  }
         |  $s += $row.getDouble($code);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDistance =
    copy(left = newLeft, right = newRight)
}

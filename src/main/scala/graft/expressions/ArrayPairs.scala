package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All ordered index pairs (a[i], a[j]), i < j, of a long-array
  * column as one in-row array<struct<p1,p2>> — the market-basket pair
  * fanout (q110) without the nested interpreted HOFs.
  *
  * Why an expression: the r18 form exploded
  * `flatten(transform(ps, (x,i) -> transform(slice(ps, i+2, ...),
  * y -> struct(x, y))))` — three CodegenFallback higher-order
  * expressions paying per-ELEMENT lambda interpretation and building
  * k intermediate arrays per basket, ~k²/2 lambda calls per order
  * (hundreds of millions at 100× scale). This is one primitive
  * double loop emitting the identical structs in the identical
  * (i, j) enumeration order.
  */
case class ArrayPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"array_pairs expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("p1", LongType, nullable = false),
      StructField("p2", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ArrayPairs.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ArrayPairs.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): ArrayPairs =
    copy(child = newChild)
}

object ArrayPairs {
  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val m = n.toLong * (n - 1) / 2
    require(m <= Int.MaxValue, s"array_pairs fanout $m exceeds array limits")
    val out = new Array[Any](m.toInt)
    var k = 0
    var i = 0
    while (i < n) {
      val x = a.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](x, a.getLong(j)))
          .asInstanceOf[InternalRow]
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_sorted_pairs(arr: array<string>)` → all unordered element pairs
  * as `array<struct<a, b>>` with `a < b` in UTF8 binary order — the
  * per-row expansion step of a document-level co-occurrence count.
  *
  * Why native: the declarative alternative is either a row self-join on
  * the document id (each side shuffles the exploded tokens, and the join
  * re-materializes every document's token list against itself) or a
  * nested `transform(slice(...))` lambda pair that evaluates interpreted
  * per pair. Here the sort + pair emission is one codegen'd loop; the
  * caller explodes the result and aggregates pair counts directly, so
  * the only shuffle in a co-occurrence query is the final pair-keyed
  * aggregate. Input arrays are expected distinct (map keys); duplicates
  * would emit duplicate pairs. Null elements are skipped; null input →
  * null; fewer than 2 usable elements → empty array. The pair count is
  * quadratic in the array length by definition — callers bound the input
  * to a top-V vocabulary first. */
case class SortedPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", StringType, nullable = false),
    StructField("b", StringType, nullable = false))), containsNull = false)

  override def prettyName: String = SortedPairs.Name

  override def nullSafeEval(arr: Any): Any =
    SortedPairs.compute(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SortedPairs.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SortedPairs {
  val Name = "graft_sorted_pairs"

  /** Called from generated code. */
  def compute(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    val elems = new java.util.ArrayList[UTF8String](m)
    var i = 0
    while (i < m) {
      val s = arr.getUTF8String(i)
      // clone: pair structs outlive this row even over a reused buffer
      if (s != null) elems.add(s.clone())
      i += 1
    }
    val n = elems.size()
    if (n < 2) return new GenericArrayData(new Array[Any](0))
    java.util.Collections.sort(elems) // UTF8String: binary order
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = InternalRow(elems.get(i), elems.get(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Name, exprs => SortedPairs(exprs.head), "built-in")
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_shingle_list(toks: array<string>, n: int literal)` → ALL word
  * n-gram shingles (space-joined) in document order, duplicates kept —
  * the occurrence-counting companion of [[ShingleSet]] (which returns
  * the sorted distinct set). Used wherever shingle MULTIPLICITY is the
  * signal: duplicated-n-gram mass, type-token diversity, blocklist hit
  * counting.
  *
  * Why native: identical reason to [[ShingleSet]] — the declarative
  * `transform(sequence(...), i -> concat_ws(' ', slice(toks, i, n)))`
  * evaluates its lambda INTERPRETED per position (measured ~4 s per
  * materialization at sf0.1 on the documents table vs < 0.5 s for this
  * codegen pass — it was the whole cost of the diversity/blocklist
  * queries). Same exact-twin semantics: fewer than `n` tokens → empty
  * array; null input → null; null elements skipped concat_ws-style.
  */
case class ShingleList(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right) match {
    case (ArrayType(StringType, _), Literal(n: Int, IntegerType)) =>
      if (n >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName: n must be >= 1, got $n")
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<string>, int literal), got " +
        s"${left.dataType.simpleString}, $right")
  }

  private def n: Int = right.asInstanceOf[Literal].value.asInstanceOf[Int]

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = ShingleList.Name

  override def nullSafeEval(arr: Any, nLit: Any): Any =
    ShingleList.compute(arr.asInstanceOf[ArrayData], nLit.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"${ev.value} = graft.functions.ShingleList.compute($a, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ShingleList {
  val Name = "graft_shingle_list"

  private val Space = UTF8String.fromString(" ")

  /** Called from generated code. */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](m - n + 1)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      // concatWs skips nulls and allocates fresh bytes — safe to retain
      // past this row even over an UnsafeArrayData input
      out(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Name, exprs => ShingleList(exprs(0), exprs(1)), "built-in")
}

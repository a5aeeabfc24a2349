package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_shingle_set(toks: array<string>, n: int literal)` → the SORTED
  * DISTINCT word n-gram shingle set (space-joined), empty when the
  * document has fewer than `n` tokens — one native pass.
  *
  * Why native: the declarative formulation
  * `array_sort(array_distinct(transform(sequence(...), slice+concat_ws)))`
  * evaluates the transform lambda INTERPRETED per shingle position and
  * pays an interpreted comparator per `array_sort` compare — measured
  * ~4 s per materialization at sf0.1 against < 1 s for the plain token
  * scan, the single hottest projection of every n-gram Jaccard query.
  * Here the shingle build + dedup + sort is one `TreeSet[UTF8String]`
  * fold per row inside whole-stage codegen.
  *
  * Exact-twin semantics (the SQL oracles depend on them):
  *  - fewer than `n` tokens → EMPTY array (not null); null input → null;
  *  - null elements inside a shingle window are skipped by the join —
  *    `concat_ws` semantics (whitespace-split tokens are never null, but
  *    the function accepts any array<string>);
  *  - ordering is UTF8String BINARY order — identical to `array_sort`
  *    (a java.lang.String comparator would misorder supplementary
  *    characters: UTF-16 code-unit order ≠ code-point order).
  */
case class ShingleSet(left: Expression, right: Expression)
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
  override def prettyName: String = ShingleSet.Name

  override def nullSafeEval(arr: Any, nLit: Any): Any =
    ShingleSet.compute(arr.asInstanceOf[ArrayData], nLit.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"${ev.value} = graft.functions.ShingleSet.compute($a, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ShingleSet {
  val Name = "graft_shingle_set"

  private val Space = UTF8String.fromString(" ")

  /** Called from generated code. */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(new Array[Any](0))
    val set = new java.util.TreeSet[UTF8String]()
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      // concatWs skips nulls and allocates fresh bytes — safe to retain
      // past this row even over an UnsafeArrayData input
      set.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    val out = new Array[Any](set.size)
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Name, exprs => ShingleSet(exprs(0), exprs(1)), "built-in")
}

package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Distinct word n-gram shingles over a token array, as one compiled pass
 * (the scale path feeding MinHash/Jaccard near-dup dedup — reference
 * README.md:61's near-duplicate requirement realized Spark-side).
 *
 * The higher-order-function formulation ([[graft.functions.Text.shinglesHof]]
 * — `transform(sequence(...), concat_ws(element_at...))` + `array_distinct`)
 * is evaluated interpreted by Spark and costs ~1 ms/doc; this expression
 * does the same work in [[ShingleUtil.distinctShingles]] (tight loop +
 * linked hash set) invoked from whole-stage codegen, cutting a corpus
 * shingling pass ~5× at sf0.1.
 *
 * Semantics (bit-compatible with the HOF version and the DuckDB oracle's
 * `list_distinct([toks[i] || ' ' || ...])`):
 *  - fewer than `n` tokens (or a NULL token array) → empty array;
 *  - shingle = n consecutive tokens joined by single spaces, NULL tokens
 *    skipped exactly like `concat_ws`;
 *  - distinct, first-occurrence order.
 */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects (array<string>, n >= 1), got " +
        s"${child.dataType.catalogString} with n=$n")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) ShingleUtil.Empty
    else ShingleUtil.distinctShingles(v.asInstanceOf[ArrayData], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    // Scala-object instance referenced from generated Java
    val util = "graft.functions.expressions.ShingleUtil$.MODULE$"
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${c.isNull} ? $util.Empty() : $util.distinctShingles(${c.value}, $n);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Compiled shingling kernel shared by interpreted eval and generated code. */
object ShingleUtil {

  val Empty: ArrayData = new GenericArrayData(Array.empty[Any])

  private val Space = UTF8String.fromString(" ")

  def distinctShingles(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return Empty
    val seen = new java.util.LinkedHashSet[UTF8String](math.max(16, m * 2))
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) {
        window(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concatWs(Space, window: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }
}

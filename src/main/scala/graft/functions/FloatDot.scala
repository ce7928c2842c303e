package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Dot product of two numeric array columns (`array<float>`,
  * `array<double>` or `array<int>`, any mix), accumulated left-to-right in double
  * precision — bit-identical to a sequential fold (and to DuckDB's
  * `list_dot_product` over `DOUBLE[]` casts), independent of partitioning.
  *
  * This is the hot inner loop of the similarity operators (SURVEY.md §7.5):
  * a native codegen'd expression over primitive arrays, preferred per
  * the custom-operator ladder over both higher-order functions
  * (`aggregate(zip_with(...))` — interpreted, boxes per element) and Scala
  * UDFs (serialization at the boundary). Stays inside whole-stage codegen.
  * The double-array acceptance exists for refined IVF centroids (per-cell
  * means are double) so the k-means re-assignment pass runs codegen'd too.
  *
  * Null array elements are not supported (embeddings are dense); extra
  * elements on the longer side are ignored.
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case ArrayType(IntegerType, _) => Some(IntegerType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"float_dot requires two array<float|double|int> inputs, " +
          s"got ${left.dataType} and ${right.dataType}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "float_dot"

  private def toDoubles(a: Any, et: DataType): Array[Double] = et match {
    case FloatType =>
      val f = a.asInstanceOf[ArrayData].toFloatArray()
      val out = new Array[Double](f.length)
      var i = 0
      while (i < f.length) { out(i) = f(i).toDouble; i += 1 }
      out
    case IntegerType =>
      val n = a.asInstanceOf[ArrayData].toIntArray()
      val out = new Array[Double](n.length)
      var i = 0
      while (i < n.length) { out(i) = n(i).toDouble; i += 1 }
      out
    case _ => a.asInstanceOf[ArrayData].toDoubleArray()
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = toDoubles(a, elemType(left).get)
    val y = toDoubles(b, elemType(right).get)
    val n = math.min(x.length, y.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x(i) * y(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def arr(src: String, name: String, idx: String, et: DataType): (String, String) =
        et match {
          case FloatType =>
            (s"float[] $name = $src.toFloatArray();", s"(double) $name[$idx]")
          case IntegerType =>
            (s"int[] $name = $src.toIntArray();", s"(double) $name[$idx]")
          case _ =>
            (s"double[] $name = $src.toDoubleArray();", s"$name[$idx]")
        }
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val (xDecl, xElem) = arr(a, x, i, elemType(left).get)
      val (yDecl, yElem) = arr(b, y, i, elemType(right).get)
      s"""
         |$xDecl
         |$yDecl
         |int $n = Math.min($x.length, $y.length);
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $xElem * $yElem;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native vector kernels for the similarity/dedup hot path.
  *
  * The declarative formulation (`aggregate(zip_with(...))`) evaluates
  * higher-order functions interpretively — measured ~20 µs per 64-dim
  * cosine; a 100 TB ANN pass would spend its life in lambda dispatch.
  * [[CosineSimilarity]] runs the identical IEEE operation sequence
  * (sequential left fold: ((0+x₁)+x₂)+…, sqrt, multiply, divide) as a tight
  * primitive loop inside whole-stage codegen — bit-identical results,
  * ~100× faster.
  */
object VectorKernels {

  /** Cosine over float arrays, accumulating in double, sequential order. */
  def cosineFloat(a: ArrayData, b: ArrayData): Double = {
    val av = a.toFloatArray()
    val bv = b.toFloatArray()
    val n = math.min(av.length, bv.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = av(i).toDouble; val y = bv(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Cosine over double arrays (same fold order). */
  def cosineDouble(a: ArrayData, b: ArrayData): Double = {
    val av = a.toDoubleArray()
    val bv = b.toDoubleArray()
    val n = math.min(av.length, bv.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = av(i); val y = bv(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Sign-LSH bucket bits in one pass: bit b set iff v · plane_b > 0. */
  def lshBits(v: ArrayData, planes: Array[Array[Double]]): Long = {
    val av = v.toFloatArray()
    var bits = 0L
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      val n = math.min(av.length, p.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += av(i).toDouble * p(i); i += 1 }
      if (dot > 0) bits |= 1L << b
      b += 1
    }
    bits
  }

  def lshBitsDouble(v: ArrayData, planes: Array[Array[Double]]): Long = {
    val av = v.toDoubleArray()
    var bits = 0L
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      val n = math.min(av.length, p.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += av(i) * p(i); i += 1 }
      if (dot > 0) bits |= 1L << b
      b += 1
    }
    bits
  }

  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  def lsh_bucket(v: Column, planes: Array[Array[Double]]): Column =
    Bridge.column(LshBucketBits(Bridge.expression(v), planes))
}

/** `cosine(array<float|double>, array<float|double>) -> double`, full
  * whole-stage codegen via a static kernel call. Null-intolerant on the
  * array itself; element nulls are not supported (dense vectors). */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine"

  private lazy val isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if lt == rt && (lt == FloatType || lt == DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine requires two array<float> or two array<double>, " +
            s"got ${left.dataType.sql} / ${right.dataType.sql}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    if (isFloat)
      VectorKernels.cosineFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      VectorKernels.cosineDouble(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel =
      if (isFloat) "graft.functions.VectorKernels.cosineFloat"
      else "graft.functions.VectorKernels.cosineDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $kernel($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `lsh_bucket(array<float>) -> long`: all hyperplane sign bits in one
  * codegen'd pass (the declarative form pays nBits interpreted
  * higher-order-function folds per row). */
case class LshBucketBits(child: Expression, planes: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "lsh_bucket"

  // float corpus columns and double derived vectors (e.g. the MIPS
  // norm-augmented view) both bucket through the same plane constants
  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    if (isFloat) VectorKernels.lshBits(input.asInstanceOf[ArrayData], planes)
    else VectorKernels.lshBitsDouble(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
    val kernel =
      if (isFloat) "graft.functions.VectorKernels.lshBits"
      else "graft.functions.VectorKernels.lshBitsDouble"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $kernel($c, $planesRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

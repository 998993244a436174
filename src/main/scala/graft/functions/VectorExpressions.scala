package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, sqrt}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.{Column, SparkSession}

/** Codegen'd float-vector kernels.
  *
  * Spark's higher-order functions (`zip_with`, `aggregate`) are
  * CodegenFallback — every per-pair cosine in a similarity join pays an
  * interpreted expression-tree walk with boxing per element. This
  * custom binary [[Expression]] generates a single static call over the
  * raw ArrayData (tight float loop, no allocation), participating in
  * whole-stage codegen — the preference-order step (b) of the build
  * brief: a native Catalyst Expression before any UDF.
  */
object VectorOps {
  /** Tight dot-product kernel over Spark's columnar ArrayData. Called
    * from generated code; left-to-right accumulation (deterministic,
    * matches a sequential SQL fold).
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** float · double variant (embedding against LSH hyperplanes). */
  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    acc
  }
}

/** `graft_dot(array<float>, array<float>) → double`. */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<float>, array<float>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dot($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_dot_fd(array<float>, array<double>) → double` — the mixed
  * variant used to project a float embedding onto double hyperplanes
  * (LSH bucketing) without casting the vector column.
  */
case class DotProductFD(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_dot_fd expects (array<float>, array<double>), got " +
            s"(${l.catalogString}, ${r.catalogString})")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotFD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dotFD($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  private val FnName = "graft_dot"
  private val FnNameFD = "graft_dot_fd"

  /** Idempotently register the kernels in the session's function
    * registry (temp functions — visible to both the Column API via
    * `call_function` and SQL). Registration is guarded: re-registering
    * logs a `graft_dot replaced...` WARN per call, which on
    * query-per-line mains (Verify/Bench) floods the logs.
    */
  def register(spark: SparkSession): Unit = {
    TextFunctions.registerOnce(spark, FnName,
      exprs => DotProductF(exprs.head, exprs(1)))
    TextFunctions.registerOnce(spark, FnNameFD,
      exprs => DotProductFD(exprs.head, exprs(1)))
  }

  def dotFD(a: Column, b: Column): Column = call_function(FnNameFD, a, b)

  def dotF(a: Column, b: Column): Column = call_function(FnName, a, b)

  def normF(a: Column): Column = sqrt(call_function(FnName, a, a))

  /** Exact cosine via the codegen'd kernel. Prefer
    * [[graft.ext.Similarity]]'s norm-precomputed paths in joins — this
    * form computes both norms per invocation.
    */
  def cosineF(a: Column, b: Column): Column =
    dotF(a, b) / (normF(a) * normF(b))
}

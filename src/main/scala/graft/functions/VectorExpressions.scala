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

  /** Symmetric int8 scalar quantization: byte_i = round(v_i / scale)
    * with scale = max|v_i| / 127 — the standard SQ8 embedding
    * compression (FAISS `SQ8` / Milvus `SQ8`): 4× smaller than float32,
    * per-element error ≤ scale/2. An all-zero vector quantizes to all
    * zero bytes (scale 0 by convention — dequantization is exact).
    */
  def quantizeI8(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte](n)
    val s = i8Scale(a)
    if (s > 0f) {
      var i = 0
      while (i < n) {
        out(i) = math.round(a.getFloat(i) / s).toByte
        i += 1
      }
    }
    out
  }

  /** The quantization scale [[quantizeI8]] uses: max|v_i| / 127.
    * Null elements are rejected loudly: `ArrayData.getFloat` would
    * silently read one as 0.0, corrupting the quantized bytes (the
    * declared type is usually `array<float>` with nullable elements —
    * parquet's default — so this cannot be a static check). Covers
    * [[quantizeI8]] too, which computes the scale first.
    */
  def i8Scale(a: ArrayData): Float = {
    val n = a.numElements()
    var m = 0f
    var i = 0
    while (i < n) {
      if (a.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_q8/graft_q8_scale: null element at index $i of the " +
            "embedding vector — quantization would silently read it as " +
            "0.0; filter or impute null elements first")
      val x = math.abs(a.getFloat(i))
      if (x > m) m = x
      i += 1
    }
    m / 127f
  }

  /** Integer dot product over two int8-quantized vectors (exact — a
    * 64-dim product of ±127 bytes peaks at ~10^6, nowhere near Long
    * range). cosine(dequantized) = dotI8(qa, qb) / (|qa|·|qb|): the
    * scales cancel, so cosine search needs no scale column at all.
    */
  def dotI8(a: Array[Byte], b: Array[Byte]): Long = {
    val n = math.min(a.length, b.length)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a(i).toLong * b(i).toLong
      i += 1
    }
    acc
  }
}

/** Product-quantization kernels (Jégou, Douze, Schmid — "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011; the FAISS
  * `PQ` index family). The codebook is a FLATTENED row-major
  * `array<double>` of `m × ksub × dsub` sub-centroids (metadata-sized:
  * 8·256·8 doubles ≈ 128 KB at dim 64 / m 8 / ksub 256), broadcast as
  * a literal — every kernel below is a tight loop over it, codegen'd
  * like the dot-product kernels above.
  */
object PqOps {
  /** PQ-encode a float vector: for each of the `m` subspaces, the index
    * of the L2-nearest sub-centroid. `dsub = d/m` and `ksub` are
    * derived from the codebook length. argmin over
    * `|c|² − 2·sv·c` (the `|sv|²` term is code-invariant); ties break
    * to the LOWEST code (strict `<`), deterministically. Returned as
    * `array<int>` rather than packed bytes so the codes stay
    * explodable for the training loop and Spark-visible for debugging;
    * parquet bit-packs small ints to ~1 byte on disk anyway, and the
    * coarse ADC stage never shuffles codes (only ids + scores ride the
    * rank exchange).
    */
  def encode(vec: ArrayData, codebook: ArrayData, m: Int): ArrayData = {
    val d = vec.numElements()
    val dsub = d / m
    val ksub = if (dsub == 0) 0 else codebook.numElements() / (m * dsub)
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestScore = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val base = (s * ksub + c) * dsub
        var cc = 0.0
        var svc = 0.0
        var j = 0
        while (j < dsub) {
          val cj = codebook.getDouble(base + j)
          cc += cj * cj
          svc += cj * vec.getFloat(s * dsub + j).toDouble
          j += 1
        }
        val score = cc - 2.0 * svc
        if (score < bestScore) { bestScore = score; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Per-query ADC lookup table: `lut[s·ksub + c] = q_s · cent_{s,c}`
    * — `m × ksub` doubles per query row. The asymmetric-distance trick:
    * the query stays EXACT (never quantized); scoring a corpus vector
    * is then `m` table lookups ([[adcDot]]) instead of a `d`-element
    * dot product.
    */
  def lut(qv: ArrayData, codebook: ArrayData, m: Int): ArrayData = {
    val d = qv.numElements()
    val dsub = d / m
    val ksub = if (dsub == 0) 0 else codebook.numElements() / (m * dsub)
    val out = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        val base = (s * ksub + c) * dsub
        var acc = 0.0
        var j = 0
        while (j < dsub) {
          acc += codebook.getDouble(base + j) *
            qv.getFloat(s * dsub + j).toDouble
          j += 1
        }
        out(s * ksub + c) = acc
        c += 1
      }
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** ADC dot product: `Σ_s lut[s·ksub + codes_s]` ≈ q · v̂ where v̂ is
    * the PQ reconstruction of the corpus vector (exact equality — the
    * reconstruction's subspaces are the looked-up centroids, and
    * cross-subspace terms don't exist in a concatenation). `ksub`
    * derives as `lut.length / codes.length`.
    */
  def adcDot(codes: ArrayData, lut: ArrayData): Double = {
    val m = codes.numElements()
    val ksub = if (m == 0) 0 else lut.numElements() / m
    var acc = 0.0
    var s = 0
    while (s < m) {
      acc += lut.getDouble(s * ksub + codes.getInt(s))
      s += 1
    }
    acc
  }
}

/** `graft_matvec_fd(array<float>, array<double>) → array<double>`:
  * flattened row-major matrix (rows×d doubles, rows derived as
  * `mat.length / vec.length`) times a float vector. Accumulation is
  * double, ascending j within each row — the summation ORDER is part
  * of the cross-engine contract (the DuckDB oracle folds the same
  * sequence via `list_sum(list(... ORDER BY j))`).
  */
object MatVecOps {
  /** [[matVecFD]] minus a per-row bias: out[r] = Σⱼ mat[r,j]·vec[j] −
    * bias[r] — the affine form a mean-centered projection needs
    * ((x−μ)ᵀWᵀ = xᵀWᵀ − μᵀWᵀ, with μᵀWᵀ precomputed driver-side).
    */
  def matVecBiasFD(vec: ArrayData, mat: ArrayData,
      bias: ArrayData): ArrayData = {
    val raw = matVecFD(vec, mat)
    val rows = raw.numElements()
    val out = new Array[Double](rows)
    var r = 0
    while (r < rows) {
      out(r) = raw.getDouble(r) - bias.getDouble(r)
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def matVecFD(vec: ArrayData, mat: ArrayData): ArrayData = {
    val d = vec.numElements()
    val rows = if (d == 0) 0 else mat.numElements() / d
    val out = new Array[Double](rows)
    var r = 0
    while (r < rows) {
      var acc = 0.0
      val base = r * d
      var j = 0
      while (j < d) {
        acc += mat.getDouble(base + j) * vec.getFloat(j)
        j += 1
      }
      out(r) = acc
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

case class MatVecFD(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_matvec_fd expects (array<float>, array<double>), got " +
            s"(${l.catalogString}, ${r.catalogString})")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    MatVecOps.matVecFD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.MatVecOps.matVecFD($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_matvec_bias_fd(array<float>, array<double>, array<double>)
  * → array<double>` — [[MatVecOps.matVecBiasFD]].
  */
case class MatVecBiasFD(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _),
          ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (a, b, c) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_matvec_bias_fd expects (array<float>, array<double>, " +
            s"array<double>), got (${a.catalogString}, ${b.catalogString}, " +
            s"${c.catalogString})")
    }
  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    MatVecOps.matVecBiasFD(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, c) => s"graft.functions.MatVecOps.matVecBiasFD($a, $b, $c)")
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
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

/** `graft_q8(array<float>) → binary` — int8 scalar quantization (see
  * [[VectorOps.quantizeI8]]). Stored as BinaryType: 4× narrower than
  * the float array on disk and through every shuffle.
  */
case class QuantizeI8(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_q8 expects array<float>, got ${t.catalogString}")
    }
  override protected def nullSafeEval(a: Any): Any =
    VectorOps.quantizeI8(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorOps.quantizeI8($a)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_q8_scale(array<float>) → float` — the matching scale, for
  * callers that reconstruct dot products or dequantize (cosine search
  * does not need it: scales cancel).
  */
case class I8Scale(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = FloatType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_q8_scale expects array<float>, got ${t.catalogString}")
    }
  override protected def nullSafeEval(a: Any): Any =
    VectorOps.i8Scale(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorOps.i8Scale($a)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_dot_i8(binary, binary) → bigint` — integer dot product over
  * quantized vectors (the coarse-scoring kernel of the SQ8 path).
  */
case class DotProductI8(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right)
      .forall(_.dataType == org.apache.spark.sql.types.BinaryType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_dot_i8 expects (binary, binary), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotI8(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dotI8($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_pq_encode(array<float>, array<double>, int) → array<int>` —
  * [[PqOps.encode]] (vector, flattened codebook, m).
  */
case class PqEncodeF(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _),
          org.apache.spark.sql.types.IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (a, b, c) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_pq_encode expects (array<float>, array<double>, int), " +
            s"got (${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }
  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    PqOps.encode(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, c) => s"graft.functions.PqOps.encode($a, $b, $c)")
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `graft_pq_lut(array<float>, array<double>, int) → array<double>` —
  * [[PqOps.lut]] (query vector, flattened codebook, m).
  */
case class PqLutF(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _),
          org.apache.spark.sql.types.IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (a, b, c) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_pq_lut expects (array<float>, array<double>, int), " +
            s"got (${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }
  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    PqOps.lut(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, c) => s"graft.functions.PqOps.lut($a, $b, $c)")
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `graft_pq_adc(array<int>, array<double>) → double` —
  * [[PqOps.adcDot]] (codes, per-query lookup table).
  */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.IntegerType, _),
          ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_pq_adc expects (array<int>, array<double>), got " +
            s"(${l.catalogString}, ${r.catalogString})")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    PqOps.adcDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.PqOps.adcDot($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  private val FnName = "graft_dot"
  private val FnNameFD = "graft_dot_fd"
  private val FnNameQ8 = "graft_q8"
  private val FnNameQ8Scale = "graft_q8_scale"
  private val FnNameDotI8 = "graft_dot_i8"
  private val FnNameMatVec = "graft_matvec_fd"
  private val FnNameMatVecBias = "graft_matvec_bias_fd"
  private val FnNamePqEncode = "graft_pq_encode"
  private val FnNamePqLut = "graft_pq_lut"
  private val FnNamePqAdc = "graft_pq_adc"

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
    TextFunctions.registerOnce(spark, FnNameQ8,
      exprs => QuantizeI8(exprs.head))
    TextFunctions.registerOnce(spark, FnNameQ8Scale,
      exprs => I8Scale(exprs.head))
    TextFunctions.registerOnce(spark, FnNameDotI8,
      exprs => DotProductI8(exprs.head, exprs(1)))
    TextFunctions.registerOnce(spark, FnNameMatVec,
      exprs => MatVecFD(exprs.head, exprs(1)))
    TextFunctions.registerOnce(spark, FnNameMatVecBias,
      exprs => MatVecBiasFD(exprs.head, exprs(1), exprs(2)))
    TextFunctions.registerOnce(spark, FnNamePqEncode,
      exprs => PqEncodeF(exprs.head, exprs(1), exprs(2)))
    TextFunctions.registerOnce(spark, FnNamePqLut,
      exprs => PqLutF(exprs.head, exprs(1), exprs(2)))
    TextFunctions.registerOnce(spark, FnNamePqAdc,
      exprs => PqAdc(exprs.head, exprs(1)))
  }

  def dotFD(a: Column, b: Column): Column = call_function(FnNameFD, a, b)

  /** Flattened row-major matrix × float vector → array<double> (the
    * codegen'd [[MatVecOps.matVecFD]] kernel).
    */
  def matVecFD(vec: Column, mat: Column): Column =
    call_function(FnNameMatVec, vec, mat)

  /** Affine projection: mat × vec − bias (the codegen'd
    * [[MatVecOps.matVecBiasFD]] kernel; mean-centered PCA transform).
    */
  def matVecBiasFD(vec: Column, mat: Column, bias: Column): Column =
    call_function(FnNameMatVecBias, vec, mat, bias)

  def dotF(a: Column, b: Column): Column = call_function(FnName, a, b)

  def normF(a: Column): Column = sqrt(call_function(FnName, a, a))

  /** Exact cosine via the codegen'd kernel. Prefer
    * [[graft.ext.Similarity]]'s norm-precomputed paths in joins — this
    * form computes both norms per invocation.
    */
  def cosineF(a: Column, b: Column): Column =
    dotF(a, b) / (normF(a) * normF(b))

  /** int8 scalar quantization of a float vector → binary. */
  def q8(a: Column): Column = call_function(FnNameQ8, a)

  /** Quantization scale of a float vector (max|v|/127). */
  def q8Scale(a: Column): Column = call_function(FnNameQ8Scale, a)

  /** Integer dot over two quantized vectors → bigint. */
  def dotI8(a: Column, b: Column): Column = call_function(FnNameDotI8, a, b)

  /** Norm of a quantized vector in quantized units (scale-free — pairs
    * with [[dotI8]] to give the cosine of the dequantized vectors).
    */
  def normI8(a: Column): Column =
    sqrt(call_function(FnNameDotI8, a, a).cast(DoubleType))

  /** PQ-encode a float vector against a flattened codebook → array<int>. */
  def pqEncode(vec: Column, codebook: Column, m: Column): Column =
    call_function(FnNamePqEncode, vec, codebook, m)

  /** Per-query ADC lookup table (m × ksub doubles). */
  def pqLut(qv: Column, codebook: Column, m: Column): Column =
    call_function(FnNamePqLut, qv, codebook, m)

  /** ADC dot product: codes × lookup table → double. */
  def pqAdc(codes: Column, lut: Column): Column =
    call_function(FnNamePqAdc, codes, lut)
}

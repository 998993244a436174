package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes the engine's custom
  * expressions first-class SQL functions for any session created with
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions
  *   // or: SparkSession.builder().withExtensions(new GraftExtensions)
  * }}}
  *
  * Library-level code paths register the same functions per-session via
  * [[VectorFunctions.register]]/[[TextFunctions.registerShingles]] —
  * this class is the deployment-time form (cluster-wide SQL users,
  * thriftserver, notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "",
      "", "4.0.0", "", "built-in")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two float arrays"),
      (exprs: Seq[Expression]) => DotProductF(exprs.head, exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_dot_fd"),
      info("graft_dot_fd",
        "graft_dot_fd(a, b) - dot product of a float and a double array"),
      (exprs: Seq[Expression]) => DotProductFD(exprs.head, exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_shingles_3"),
      info("graft_shingles_3",
        "graft_shingles_3(text) - distinct word 3-grams of normalized text"),
      (exprs: Seq[Expression]) => TextShingles(exprs.head, 3)))
    // the Gopher repetition kernels, at the n the curation filter uses
    // (per-n names mirror the in-session registry convention)
    for (n <- Seq(2, 3))
      e.injectFunction((FunctionIdentifier(s"graft_top_ngram_frac_$n"),
        info(s"graft_top_ngram_frac_$n",
          s"graft_top_ngram_frac_$n(text) - occupancy of the most frequent word $n-gram"),
        (exprs: Seq[Expression]) => TextTopNgramFrac(exprs.head, n)))
    e.injectFunction((FunctionIdentifier("graft_dup_line_frac"),
      info("graft_dup_line_frac",
        "graft_dup_line_frac(text) - fraction of line chars in duplicated lines"),
      (exprs: Seq[Expression]) => TextDupLineFrac(exprs.head)))
    e.injectFunction((FunctionIdentifier("graft_q8"),
      info("graft_q8",
        "graft_q8(v) - int8 scalar quantization of a float array (binary)"),
      (exprs: Seq[Expression]) => QuantizeI8(exprs.head)))
    e.injectFunction((FunctionIdentifier("graft_q8_scale"),
      info("graft_q8_scale",
        "graft_q8_scale(v) - quantization scale (max|v|/127) of a float array"),
      (exprs: Seq[Expression]) => I8Scale(exprs.head)))
    e.injectFunction((FunctionIdentifier("graft_dot_i8"),
      info("graft_dot_i8",
        "graft_dot_i8(a, b) - integer dot product of two int8-quantized vectors"),
      (exprs: Seq[Expression]) => DotProductI8(exprs.head, exprs(1))))
  }
}

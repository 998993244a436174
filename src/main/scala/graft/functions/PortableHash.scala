package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The md5-60-bit portable hash: a pure function of (tag, seed, id)
  * computable IDENTICALLY by Spark built-ins
  * (`conv(substr(md5(...),1,15),16,10)`) and by the DuckDB oracle
  * (digit-fold over the same 15 hex chars — `SparkEntry.h60Sql`). Used
  * wherever a deterministic per-row draw must be value-level
  * verifiable cross-engine: the synthetic generator, rate sampling,
  * sequence packing. (Hot paths that never need cross-engine equality
  * use `xxhash64` — cheaper, but Spark-only.)
  */
object PortableHash {
  /** 60-bit hash of `tag:seed:<id as string>`, always in [0, 2^60). */
  def h60(tag: String, seed: Long, i: Column): Column =
    conv(substring(md5(
      concat(lit(s"$tag:$seed:"), i.cast("string")).cast("binary")),
      1, 15), 16, 10).cast(LongType)

  /** Driver-side JVM replica of [[h60]] — identical md5 / 15-hex-digit
    * arithmetic, for constructing small derived artifacts (e.g. the
    * seeded random-projection matrix) that both the executors (as a
    * broadcast literal) and the DuckDB oracle (via `SparkEntry
    * .h60Sql`) must reproduce bit-for-bit.
    */
  def h60Jvm(tag: String, seed: Long, i: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$tag:$seed:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.take(8).map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }
}

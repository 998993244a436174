package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{DataType, NumericType, StructType,
  TimestampType}

/** Shared scaffolding for the Row-based (composite-key) faces of the
  * streaming operators ([[StreamingAsOf.asOfEnrichRows]],
  * [[StreamingFeatures.rollingRangeRows]]): call-time column
  * validation that fails with the column NAME, and runtime cell reads
  * that stay correct under either session datetime representation —
  * one source of truth so the faces cannot drift apart.
  */
private[streaming] object RowFaces {

  /** Index of `name`, required to carry exactly `t` (fails at call
    * time with the column name, not deep in an executor task). */
  def fieldOfType(schema: StructType, name: String, t: DataType): Int = {
    val i = schema.fieldIndex(name) // throws with the column name
    require(schema(i).dataType == t,
      s"column $name must be $t, got ${schema(i).dataType}")
    i
  }

  /** Index of `name`, required to be numeric (the caller casts to
    * double downstream). */
  def numericField(schema: StructType, name: String): Int = {
    val i = schema.fieldIndex(name)
    require(schema(i).dataType.isInstanceOf[NumericType],
      s"column $name must be numeric, got ${schema(i).dataType}")
    i
  }

  /** Event-time cell as epoch micros. Rows carry `java.sql.Timestamp`
    * by default but `java.time.Instant` when the session enables
    * `spark.sql.datetime.java8API.enabled` — the schema check
    * (TimestampType either way) cannot distinguish them, so the read
    * must handle both; a null event time is a data error named here
    * rather than an NPE in the state task. */
  def tsMicros(r: Row, idx: Int, name: String): Long =
    r.get(idx) match {
      case t: java.sql.Timestamp =>
        t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
      case i: java.time.Instant =>
        java.lang.Math.addExact(
          java.lang.Math.multiplyExact(i.getEpochSecond, 1000000L),
          (i.getNano / 1000).toLong)
      case null => throw new IllegalArgumentException(
        s"null $name (event-time) in a streaming Row face input row")
      case other => throw new IllegalArgumentException(
        s"column $name: unsupported event-time representation " +
          s"${other.getClass.getName}")
    }

  /** Double cell with a loud, column-named null error (a null would
    * otherwise surface as an opaque NPE inside the executor). */
  def doubleCell(r: Row, idx: Int, name: String): Double = {
    if (r.isNullAt(idx)) throw new IllegalArgumentException(
      s"null $name in a streaming Row face input row — filter nulls " +
        "before the operator or fix the upstream projection")
    r.getDouble(idx)
  }

  /** The TimestampType guard both faces need for their event-time
    * column. */
  def timestampField(schema: StructType, name: String): Int =
    fieldOfType(schema, name, TimestampType)
}

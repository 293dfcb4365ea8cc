package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Precision-agnostic event-time extraction.
  *
  * The `events` fixture's `ts` column has shipped as parquet
  * TIMESTAMP(NANOS) (which Spark 4 only reads as a nanos LONG under
  * `spark.sql.legacy.parquet.nanosAsLong=true`) and as TIMESTAMP(MICROS)
  * (read as TIMESTAMP_NTZ). The DuckDB oracle side is already agnostic
  * (`CAST(ts AS TIMESTAMP)`); this helper makes the Spark side agnostic
  * too by branching on the OBSERVED dataType instead of hard-coding one
  * precision. All event-time consumers (EventQueries, IncrementalIngest,
  * StreamJoin) derive epoch seconds through this single definition.
  */
object TimeColumns {

  /** Epoch-second BIGINT column for `df`'s raw `name` field.
    *
    *  - nanos LONG → exact integer division (a double division would
    *    lose precision above 2^53 ns);
    *  - TIMESTAMP / TIMESTAMP_NTZ → `unix_timestamp` (NTZ is first cast
    *    to TIMESTAMP, interpreted in the session time zone — every graft
    *    entry point pins `spark.sql.session.timeZone=UTC`, matching the
    *    oracle's naive-as-UTC reading).
    *
    * Works on both batch and streaming DataFrames (only the schema is
    * consulted). Unknown types fail fast at plan-build time rather than
    * silently mis-deriving time.
    */
  def epochSeconds(df: DataFrame, name: String = "ts"): Column =
    df.schema(name).dataType match {
      case LongType         => expr(s"`$name` div 1000000000")
      case TimestampNTZType => unix_timestamp(col(name).cast(TimestampType))
      case TimestampType    => unix_timestamp(col(name))
      case other => throw new IllegalArgumentException(
        s"unsupported event-time type for column `$name`: $other " +
          "(expected nanos LONG, TIMESTAMP, or TIMESTAMP_NTZ)")
    }
}

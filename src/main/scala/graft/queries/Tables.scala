package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  * Explicit per-table helpers keep call-sites honest about what they scan;
  * column pruning + predicate pushdown then happen at the parquet scan.
  */
object Tables {
  /** Parquet `timestamp[us]` columns written without `isAdjustedToUTC`
    * arrive as TIMESTAMP_NTZ under Spark 4's default inference; every
    * consumer here (unix_micros, timestamp literals, window bounds) and
    * the DuckDB oracle treat them as UTC instants, so normalize NTZ ->
    * TIMESTAMP at the loader. The cast interprets the wall clock in the
    * session timezone, which every entry point pins to UTC — the same
    * convention DuckDB applies reading the naive values. A projection
    * (not per-column withColumn) keeps this one map over the scan and
    * preserves pushdown on the untouched columns.
    *
    * Top-level fields only today; a nested struct/array carrying
    * TIMESTAMP_NTZ FAILS FAST here (instead of silently passing through
    * unnormalized) — extend to a recursive rewrite when a driver table
    * first needs it.
    */
  private def hasNestedNtz(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case TimestampNTZType => true
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.exists(f => hasNestedNtz(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasNestedNtz(a.elementType)
      case m: org.apache.spark.sql.types.MapType =>
        hasNestedNtz(m.keyType) || hasNestedNtz(m.valueType)
      case _ => false
    }

  private def ntzToUtc(df: DataFrame): DataFrame = {
    val nested = df.schema.fields
      .filter(f => f.dataType != TimestampNTZType && hasNestedNtz(f.dataType))
    require(nested.isEmpty,
      s"nested TIMESTAMP_NTZ in column(s) ${nested.map(_.name).mkString(", ")} " +
        "— ntzToUtc normalizes top-level fields only; extend it to a " +
        "recursive rewrite for this table")
    if (!df.schema.exists(_.dataType == TimestampNTZType)) df
    else df.select(df.schema.fields.map { f =>
      if (f.dataType == TimestampNTZType)
        col(f.name).cast(TimestampType).as(f.name)
      else col(f.name)
    }.toIndexedSeq: _*)
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    ntzToUtc(spark.read.parquet(s"$dir/$name.parquet"))

  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  /** The events table carries TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects; read nanos as long (legacy conf) and truncate to microseconds
    * with integer division (ns-since-epoch overflows double's 2^53 mantissa,
    * so a float division here would corrupt timestamps).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

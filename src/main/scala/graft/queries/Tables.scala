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
    * Top-level fields only: today's driver tables are flat. If a nested
    * struct/array ever carries TIMESTAMP_NTZ it would pass through here
    * unnormalized — extend to a recursive rewrite at that point.
    */
  private def ntzToUtc(df: DataFrame): DataFrame = {
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

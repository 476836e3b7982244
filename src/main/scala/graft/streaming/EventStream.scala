package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table shape: the same
  * logical transforms compile to a batch plan on `spark.read` and an
  * incremental streaming plan on `spark.readStream` — declare once, run
  * either way.
  *
  * The reference is strictly request/response (SURVEY §2.11: no streaming),
  * so this module is a 100TB-pipeline extension: watermarked tumbling
  * windows for late-tolerant aggregation, and custom session state via
  * mapGroupsWithState (the streaming analog of the batch gaps-and-islands
  * sessionization in EventQueries).
  */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
  ))

  /** Streaming source over a parquet directory (schema must be explicit
    * for streaming reads).
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Streaming source over the DRIVER's `events.parquet`, robust to the
    * generator's timestamp encoding — which has varied across rounds:
    * TIMESTAMP(NANOS) (unreadable as a timestamp; read as long under the
    * legacy conf and truncated to micros), micros without isAdjustedToUTC
    * (arrives TIMESTAMP_NTZ under Spark 4's default inference), or plain
    * UTC micros. A streaming read schema must match the file's physical
    * type, so probe the footer with a batch schema-only read, declare
    * `ts` as what is actually on disk, and normalize to TIMESTAMP (UTC
    * session) after the scan. Returns exactly `fields`, in order.
    */
  def eventsParquetStream(s: SparkSession, dir: String,
      fields: Seq[String]): DataFrame = {
    val unknown = fields.filterNot(eventSchema.fieldNames.contains)
    require(unknown.isEmpty,
      s"eventsParquetStream: unknown field(s) ${unknown.mkString(", ")} — " +
        s"eventSchema has ${eventSchema.fieldNames.mkString(", ")}")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val onDisk = s.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    val raw = StructType(eventSchema.fields.toIndexedSeq
      .filter(f => fields.contains(f.name))
      .map(f => if (f.name == "ts") StructField("ts", onDisk) else f))
    val src = s.readStream.schema(raw)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    val norm = onDisk match {
      case LongType =>
        // ns-since-epoch: integer division — a float path would lose
        // precision past double's 2^53 mantissa (Tables.events's note)
        src.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        src.withColumn("ts", col("ts").cast(TimestampType))
      case _ => src
    }
    norm.select(fields.map(col): _*)
  }

  /** Tumbling 1-hour window per event_type with a 30-minute watermark:
    * counts + exact (decimal) sum. Works on both batch and streaming
    * DataFrames — the watermark is a no-op in batch mode.
    */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  // ---- stateful sessionization (mapGroupsWithState) -------------------

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(lastTs: Long, nSessions: Long, nEvents: Long)
  case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  /** Per-user session counting with a 30-minute idle gap — custom state
    * machine via mapGroupsWithState. In streaming mode state persists
    * across micro-batches (one state row per user); in tests it is driven
    * by a memory-sink query over a file source.
    *
    * Mirrors the batch `e_sessionize` query so the two paths can be
    * asserted equal on the same input.
    */
  def sessionize(events: Dataset[Ev]): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, UserSessions](
        GroupStateTimeout.NoTimeout) {
        case (userId, evs, state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          sorted.foreach { e =>
            val t = e.ts.getTime
            val newSession = st.lastTs == Long.MinValue ||
              t - st.lastTs > 30L * 60 * 1000
            st = SessionState(math.max(st.lastTs, t),
              st.nSessions + (if (newSession) 1 else 0), st.nEvents + 1)
          }
          state.update(st)
          UserSessions(userId, st.nSessions, st.nEvents)
      }
  }

  /** Run a streaming query over `srcDir` into an in-memory table and block
    * until the backlog is processed — the local harness for asserting
    * stream==batch parity.
    */
  def runToMemory(spark: SparkSession, srcDir: String, queryName: String,
      transform: DataFrame => DataFrame,
      outputMode: OutputMode = OutputMode.Update()): Unit = {
    val q = transform(readEventStream(spark, srcDir))
      .writeStream.outputMode(outputMode)
      .format("memory").queryName(queryName)
      .start()
    try q.processAllAvailable() finally q.stop()
  }
}

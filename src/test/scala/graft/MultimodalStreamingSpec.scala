package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.streaming.EventStream

/** Multimodal plumbing + streaming parity specs. */
class MultimodalStreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mediaFromDocs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("media_id"),
        lit("image/fake").as("mime_type"),
        col("text").cast("binary").as("payload"))

  test("StoreSink: stream-ingested library searchable with batch parity") {
    import java.nio.file.Files
    val fixedClock = () => java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    // chunk rows as a file stream: 40 rows across 2 parquet files
    val srcDir = graft.TempDirs.scratch("graft-sink-src").toString
    val rows = (0 until 40).map { i =>
      (f"c$i%04d", s"text $i",
        Array((i % 7).toFloat, ((i * 3) % 5).toFloat), i)
    }
    import spark.implicits._
    rows.take(20).toDF("id", "text", "embedding", "position")
      .coalesce(1).write.mode("append").parquet(srcDir)
    rows.drop(20).toDF("id", "text", "embedding", "position")
      .coalesce(1).write.mode("append").parquet(srcDir)

    // streaming ingest
    val engS = new graft.engine.VectorEngine(spark,
      graft.TempDirs.scratch("graft-sink-eng").toString, fixedClock)
    val libS = engS.createLibrary("streamed", 2)
    val docS = engS.createDocument(libS)
    val stream = spark.readStream
      .schema("id STRING, text STRING, embedding ARRAY<FLOAT>, position INT")
      .option("maxFilesPerTrigger", "1") // force 2 micro-batches
      .parquet(srcDir)
    val q = graft.streaming.StoreSink.ingestStream(engS, libS, docS, stream)
    try q.awaitTermination(120000) finally if (q.isActive) q.stop()
    assert(engS.chunks.count() == 40)

    // batch ingest of the same rows
    val engB = new graft.engine.VectorEngine(spark,
      graft.TempDirs.scratch("graft-sink-batch").toString, fixedClock)
    val libB = engB.createLibrary("batched", 2)
    val docB = engB.createDocument(libB)
    engB.bulkIngest(libB, docB, spark.read.parquet(srcDir))

    def hits(e: graft.engine.VectorEngine, l: String) =
      e.search(l, Array(1f, 2f), k = 5).collect()
        .map(r => (r.getString(0), r.getDouble(2))).toSeq
    assert(hits(engS, libS) == hits(engB, libB),
      "stream-ingested results must equal batch-ingested results")

    // replayed batch (same content) is idempotent: replace, not grow
    engS.bulkIngest(libS, docS, spark.read.parquet(srcDir))
    assert(engS.chunks.count() == 40)
  }

  test("decodeBatch parses REAL png/jpeg/gif/bmp headers; fake only as fallback") {
    import spark.implicits._
    import graft.multimodal.Multimodal
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // PNG: signature + IHDR, 640x480, color type 6 (RGBA -> 4 channels)
    val png = b(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13) ++ "IHDR".getBytes ++
      b(0, 0, 2, 0x80, 0, 0, 1, 0xe0, 8, 6, 0, 0, 0)
    // JPEG: SOI + APP0(len 16) + SOF0 (len 17): 240 high, 320 wide, 3 comps
    val jpeg = b(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x10) ++
      Array.fill[Byte](14)(0) ++
      b(0xff, 0xc0, 0x00, 0x11, 8, 0x00, 0xf0, 0x01, 0x40, 3) ++
      Array.fill[Byte](12)(0)
    // GIF89a: 100 x 50 logical screen
    val gif = "GIF89a".getBytes ++ b(100, 0, 50, 0) ++ Array.fill[Byte](4)(0)
    // BMP: BITMAPINFOHEADER, 800 x -600 (top-down), 24 bpp -> 3 channels
    val bmp = "BM".getBytes ++ Array.fill[Byte](12)(0) ++
      b(40, 0, 0, 0) ++ // BITMAPINFOHEADER size
      b(0x20, 0x03, 0, 0) ++ b(0xa8, 0xfd, 0xff, 0xff) ++
      b(0, 0, 24, 0) ++ Array.fill[Byte](4)(0)
    val junk = "not an image at all".getBytes
    val rows = Seq(
      Multimodal.MediaRow(1L, "image/png", png),
      Multimodal.MediaRow(2L, "image/jpeg", jpeg),
      Multimodal.MediaRow(3L, "image/gif", gif),
      Multimodal.MediaRow(4L, "image/bmp", bmp),
      Multimodal.MediaRow(5L, "application/octet-stream", junk))
    val out = Multimodal.decodeBatch(rows.toDS())
      .collect().map(r => r.media_id -> ((r.width, r.height, r.channels))).toMap
    assert(out(1L) == ((640, 480, 4)))
    assert(out(2L) == ((320, 240, 3)))
    assert(out(3L) == ((100, 50, 3)))
    assert(out(4L) == ((800, 600, 3)))
    // unrecognized payload: deterministic fake within documented bounds
    val (fw, fh, fc) = out(5L)
    assert(fw >= 1 && fw <= 1920 && fh >= 1 && fh <= 1080 && fc >= 1 && fc <= 3)
    // truncated header must not crash — falls back, never throws
    val trunc = Multimodal.decodeBatch(
      Seq(Multimodal.MediaRow(6L, "image/png", png.take(10))).toDS()).collect()
    assert(trunc.length == 1)
  }

  test("decodePixels: REAL javax.imageio decode of synthetic PNGs, exact channel sums") {
    import spark.implicits._
    import graft.multimodal.Multimodal
    val media = (0 until 8).map(i =>
      Multimodal.MediaRow(i.toLong, "image/png", Multimodal.syntheticPng(i)))
    val out = Multimodal.decodePixels(media.toDS().repartition(3))
      .collect().map(r => r.media_id -> r).toMap
    assert(out.size == 8)
    for (i <- 0 until 8) {
      val w = 8 + i % 5; val h = 6 + i % 3
      // integrate the generator formula directly — PNG is lossless, so
      // the decoded sums must be EXACTLY these
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        sr += (7 * x + 11 * y + i) % 256
        sg += (3 * x + 5 * y + 2 * i) % 256
        sb += (13 * x + 17 * y + 3 * i) % 256
      }
      val r = out(i.toLong)
      assert(r.decoded, s"png $i must be ImageIO-decodable")
      assert((r.width, r.height, r.channels) == ((w, h, 3)), s"png $i dims")
      assert((r.sum_r, r.sum_g, r.sum_b) == ((sr, sg, sb)), s"png $i sums")
    }
    // unreadable payload: header/fake fallback, decoded = false, no throw
    val fb = Multimodal.decodePixels(
      Seq(Multimodal.MediaRow(99L, "application/octet-stream",
        "not an image".getBytes)).toDS()).collect().head
    assert(!fb.decoded && fb.sum_r == 0L)
    assert(fb.width >= 1 && fb.width <= 1920)
  }

  test("decodeAudio: REAL WAV decode of synthetic PCM, exact sample sums") {
    import spark.implicits._
    import graft.multimodal.Multimodal
    val media = (0 until 6).map(i =>
      Multimodal.MediaRow(i.toLong, "audio/wav", Multimodal.syntheticWav(i)))
    val out = Multimodal.decodeAudio(media.toDS().repartition(2))
      .collect().map(r => r.media_id -> r).toMap
    for (i <- 0 until 6) {
      val n = 50 + (i % 7) * 10
      var sum = 0L
      for (s <- 0 until n) sum += ((s.toLong * 2311 + i.toLong * 977) % 20001) - 10000
      val r = out(i.toLong)
      assert(r.decoded, s"wav $i must parse")
      assert((r.sample_rate, r.channels, r.n_samples) == ((8000, 1, n.toLong)),
        s"wav $i format")
      assert(r.sum_samples == sum, s"wav $i sample sum")
    }
    val junk = Multimodal.decodeAudio(
      Seq(Multimodal.MediaRow(9L, "audio/wav", "nope".getBytes)).toDS())
      .collect().head
    assert(!junk.decoded && junk.sum_samples == 0L)
  }

  test("image meta extraction: deterministic, bounded, schema-typed") {
    val meta = Multimodal.extractImageMeta(mediaFromDocs)
    val rows = meta.select(col("media_id"), col("meta.width"),
      col("meta.height"), col("meta.channels"), col("meta.n_bytes")).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getInt(1) >= 1 && r.getInt(1) <= 1920)
      assert(r.getInt(2) >= 1 && r.getInt(2) <= 1080)
      assert(r.getInt(3) >= 1 && r.getInt(3) <= 3)
      assert(r.getLong(4) > 0)
    }
    // deterministic: second run bit-identical
    val again = Multimodal.extractImageMeta(mediaFromDocs)
      .select("media_id", "meta.sha").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    meta.select("media_id", "meta.sha").collect()
      .foreach(r => assert(again(r.getLong(0)) == r.getString(1)))
  }

  test("frame sampling: n frames per media, payload fully covered in order") {
    val frames = Multimodal.sampleFrames(mediaFromDocs, 4)
    val counts = frames.groupBy("media_id").count().collect()
    assert(counts.forall(_.getLong(1) == 4))
    // reassembling the first doc's frames must be a prefix of the payload
    val payload = mediaFromDocs.filter(col("media_id") === 0)
      .select("payload").collect().head.getAs[Array[Byte]](0)
    val fs = frames.filter(col("media_id") === 0).orderBy("frame_no")
      .select("frame_bytes").collect().map(_.getAs[Array[Byte]](0))
    val joined = fs.flatten
    assert(joined.sameElements(payload.take(joined.length)))
  }

  test("mapPartitions batch decode equals the expression decode path for headerless payloads") {
    import spark.implicits._
    // the equivalence only holds where NO image signature matches: the
    // batch path then falls back to the same hash-derived fake the
    // expression path always uses (header-bearing payloads deliberately
    // diverge — the batch path parses them for real, see the header spec)
    val media = mediaFromDocs
    assert(media.collect().forall { r =>
      graft.multimodal.ImageHeaders.parse(r.getAs[Array[Byte]]("payload")).isEmpty
    }, "fixture payloads must not carry real image headers")
    val viaExpr = Multimodal.extractImageMeta(media)
      .select(col("media_id"), col("meta.width"), col("meta.height"),
        col("meta.channels")).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    val viaBatch = Multimodal.decodeBatch(
        media.as[Multimodal.MediaRow]).collect()
      .map(r => r.media_id -> (r.width, r.height, r.channels)).toMap
    assert(viaBatch.size == viaExpr.size)
    viaExpr.foreach { case (id, m) => assert(viaBatch(id) == m) }
  }

  test("streaming tumbling agg equals the batch plan on the same data") {
    val dir = graft.TempDirs.scratch("graft-stream").toString
    // rewrite through Tables.events: the raw file carries TIMESTAMP(NANOS),
    // which neither the batch nor the streaming parquet reader accepts
    graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(dir)
    EventStream.runToMemory(spark, dir, "stream_hourly",
      EventStream.hourlyByType,
      org.apache.spark.sql.streaming.OutputMode.Complete())
    val streamed = spark.table("stream_hourly")
      .orderBy("window_start", "event_type").collect()
    val batch = EventStream.hourlyByType(
        spark.read.schema(EventStream.eventSchema).parquet(dir))
      .orderBy("window_start", "event_type").collect()
    assert(streamed.length == batch.length && streamed.nonEmpty)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }

  test("watermark drops data later than the 30-minute bound across micro-batches") {
    import spark.implicits._
    val dir = graft.TempDirs.scratch("graft-late").toString
    def ev(id: Long, ts: String, v: Double) =
      (id, java.sql.Timestamp.valueOf(ts), 1L, "click", v, "{}")
    // batch 1 advances the watermark to 12:00 - 30min = 11:30
    Seq(ev(1, "2024-01-01 10:10:00", 1.0), ev(2, "2024-01-01 12:00:00", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir)
    val q = EventStream.hourlyByType(EventStream.readEventStream(spark, dir))
      .writeStream.outputMode("update").format("memory")
      .queryName("late_test").start()
    try {
      q.processAllAvailable()
      // batch 2: one on-time event and one LATE event (10:20 < 11:30 bound)
      Seq(ev(3, "2024-01-01 12:05:00", 1.0), ev(4, "2024-01-01 10:20:00", 99.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("late_test")
      .groupBy("window_start").agg(org.apache.spark.sql.functions.max("n").as("n"))
      .collect().map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    // the 10:00 window must still count only event 1 — event 4 was dropped
    assert(out("2024-01-01 10:00:00.0") == 1L)
    // the 12:00 window saw both on-time events
    assert(out("2024-01-01 12:00:00.0") == 2L)
  }

  test("eventsParquetStream adapts to NTZ-micros and UTC-micros ts encodings") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    // one row set, written under BOTH encodings the driver has shipped
    // (plus the nanos-as-long case, which Spark cannot write and is
    // covered by the LongType branch reading micros `div 1000`-style
    // would corrupt — asserted indirectly by the exact instants here)
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", 7L, "click", 1.0, "{}"),
      (2L, "2024-01-02 23:59:59", 8L, "purchase", 2.5, "{}"))
    def writeEvents(ntz: Boolean): String = {
      val dir = graft.TempDirs.scratch(
        if (ntz) "graft-ntz-ev" else "graft-ltz-ev").toString
      val base = rows.toDF("event_id", "ts", "user_id", "event_type",
          "value", "props")
      val typed =
        if (ntz) base.withColumn("ts", to_timestamp_ntz(col("ts")))
        else base.withColumn("ts", to_timestamp(col("ts")))
      val stage = s"$dir/stage"
      typed.coalesce(1).write.parquet(stage)
      // the driver ships ONE file literally named events.parquet; the
      // stream helper's pathGlobFilter expects that layout
      val part = Files.list(Paths.get(stage)).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      Files.move(Paths.get(part), Paths.get(s"$dir/events.parquet"))
      dir
    }
    for (ntz <- Seq(true, false)) {
      val dir = writeEvents(ntz)
      val src = graft.streaming.EventStream.eventsParquetStream(spark, dir,
        Seq("event_id", "ts", "user_id", "event_type"))
      assert(src.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType)
      val name = s"ntz_adapt_${ntz}"
      val q = src.writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.table(name).orderBy("event_id")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString))
      // session tz is UTC, so the NTZ wall clock and the UTC instant
      // must read back as the SAME timestamps
      assert(got.toSeq == Seq(
        (1L, "2024-01-01 10:00:00.0"), (2L, "2024-01-02 23:59:59.0")),
        s"encoding ntz=$ntz")
    }
  }

  test("stateful streaming sessionization equals the batch window query") {
    import spark.implicits._
    val dir = graft.TempDirs.scratch("graft-stream2").toString
    // rewrite through Tables.events: the raw file carries TIMESTAMP(NANOS),
    // which neither the batch nor the streaming parquet reader accepts
    graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(dir)
    EventStream.runToMemory(spark, dir, "stream_sessions",
      df => EventStream.sessionize(
        df.select($"event_id", $"ts", $"user_id", $"event_type", $"value")
          .as[EventStream.Ev]).toDF())
    val streamed = spark.table("stream_sessions")
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val batch = graft.SparkEntry.queries("e_sessionize")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(streamed.toSeq == batch.toSeq)
  }
}

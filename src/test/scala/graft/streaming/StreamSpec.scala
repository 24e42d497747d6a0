package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.streaming.StreamOps.Event

/** Top-level so spark.implicits can derive its Encoder. */
case class StreamSpecDoc(doc_id: Long, ts: Timestamp, text: String)

/** Lineitem money columns for the streaming pricing-rollup parity test. */
case class StreamSpecLine(
    l_returnflag: String, l_linestatus: String, l_shipdate: Timestamp,
    l_quantity: Double, l_extendedprice: Double, l_discount: Double, l_tax: Double)

/** Structured-Streaming semantics through MemoryStream: windowed counts
  * close on watermark, session windows merge by gap, within-watermark
  * dedup, and custom mapGroupsWithState totals. Each query drains with
  * processAllAvailable so assertions see deterministic state.
  */
class StreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(hhmm: String): Timestamp = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
  private def memStream[A: Encoder]: MemoryStream[A] =
    MemoryStream[A](implicitly[Encoder[A]], spark.sqlContext)
  private var n = 0
  private def sinkName(): String = { n += 1; s"stream_sink_$n" }

  test("tumblingCounts: windows emit once closed by the watermark (append)") {
    val ms = memStream[(Timestamp, String)]
    val out = sinkName()
    val q = StreamOps
      .tumblingCounts(ms.toDF.toDF("ts", "etype"), "ts", "10 minutes", Seq(col("etype")), "5 minutes")
      .writeStream.format("memory").queryName(out).outputMode("append").start()
    try {
      ms.addData((ts("10:01"), "a"), (ts("10:02"), "a"), (ts("10:03"), "b"))
      q.processAllAvailable()
      assert(spark.table(out).count() == 0, "window must stay open until the watermark passes")
      ms.addData((ts("10:30"), "a")) // watermark -> 10:25, closes [10:00,10:10)
      q.processAllAvailable()
      val rows = spark.table(out)
        .select(col("window.start"), col("etype"), col("cnt"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(rows == Set((ts("10:00"), "a", 2L), (ts("10:00"), "b", 1L)))
    } finally q.stop()
  }

  test("heavy-hitters sketch aggregates inside a watermarked streaming window") {
    // the custom TypedImperativeAggregate must serialize/merge correctly
    // under streaming state: per-window top terms, emitted on watermark
    // close (trending-terms over a stream — the MG sketch's partial
    // buffers live in the state store between micro-batches)
    val ms = memStream[(Timestamp, String)]
    val out = sinkName()
    val q = ms.toDF.toDF("ts", "term")
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(graft.functions.HeavyHitters.topK(col("term"), width = 16, k = 2).as("top"))
      .writeStream.format("memory").queryName(out).outputMode("append").start()
    try {
      // two micro-batches into the SAME window: the sketch buffer must
      // round-trip the state store between them
      ms.addData((ts("10:01"), "x"), (ts("10:02"), "y"), (ts("10:03"), "x"))
      q.processAllAvailable()
      ms.addData((ts("10:04"), "x"), (ts("10:05"), "y"), (ts("10:06"), "x"), (ts("10:07"), "z"))
      q.processAllAvailable()
      ms.addData((ts("10:30"), "w")) // watermark -> 10:25, closes [10:00,10:10)
      q.processAllAvailable()
      val rows = spark.table(out)
        .select(col("window.start"), explode(col("top")).as("e"))
        .select(col("start"), col("e.item"), col("e.cnt"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(rows == Set((ts("10:00"), "x", 4L), (ts("10:00"), "y", 2L)),
        s"streaming sketch state diverged: $rows")
    } finally q.stop()
  }

  test("sessionize: events within the gap merge into one session") {
    val ms = memStream[(Timestamp, Long, Double)]
    val out = sinkName()
    val df = ms.toDF.toDF("ts", "user_id", "value")
    val q = StreamOps.sessionize(df, "ts", col("user_id"), gap = "5 minutes", lateness = "1 minute")
      .writeStream.format("memory").queryName(out).outputMode("append").start()
    try {
      // user 1: 10:00,10:03,10:06 -> one session; 10:30 -> a second one
      ms.addData((ts("10:00"), 1L, 1.0), (ts("10:03"), 1L, 2.0), (ts("10:06"), 1L, 3.0))
      ms.addData((ts("10:30"), 1L, 4.0))
      q.processAllAvailable()
      ms.addData((ts("11:30"), 2L, 0.0)) // advance watermark, close everything earlier
      q.processAllAvailable()
      val sessions = spark.table(out)
        .where(col("user_id") === 1L)
        .select(col("session_start"), col("n_events"), col("sum_value"))
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet
      assert(sessions == Set((ts("10:00"), 3L, 6.0), (ts("10:30"), 1L, 4.0)))
    } finally q.stop()
  }

  test("dedupStream: duplicate ids within the watermark are dropped") {
    val ms = memStream[(Timestamp, Long)]
    val out = sinkName()
    val q = StreamOps.dedupStream(ms.toDF.toDF("ts", "id"), "ts", Seq("id"), "10 minutes")
      .writeStream.format("memory").queryName(out).outputMode("append").start()
    try {
      ms.addData((ts("10:00"), 7L), (ts("10:01"), 7L), (ts("10:02"), 8L))
      q.processAllAvailable()
      ms.addData((ts("10:04"), 7L)) // still within watermark -> duplicate
      q.processAllAvailable()
      val ids = spark.table(out).select("id").collect().map(_.getLong(0)).toSeq
      assert(ids.sorted == Seq(7L, 8L))
    } finally q.stop()
  }

  test("runningUserTotals: mapGroupsWithState accumulates across batches") {
    val ms = memStream[Event]
    val out = sinkName()
    val q = StreamOps.runningUserTotals(ms.toDS())
      .writeStream.format("memory").queryName(out).outputMode("update").start()
    try {
      ms.addData(
        Event(1L, ts("10:00"), 100L, "click", 1.0),
        Event(2L, ts("10:01"), 100L, "view", 2.0),
        Event(3L, ts("10:02"), 200L, "click", 5.0))
      q.processAllAvailable()
      ms.addData(Event(4L, ts("10:03"), 100L, "purchase", 4.0))
      q.processAllAvailable()
      // update sink appends each emitted update; the LAST row per user is
      // the current running state
      val latest = spark.table(out)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).map { case (u, rows) => u -> rows.last }
      assert(latest(100L) == ((100L, 3L, 7.0)))
      assert(latest(200L) == ((200L, 1L, 5.0)))
    } finally q.stop()
  }

  test("runningUserTotalsTws: transformWithState matches the mapGroupsWithState op") {
    // the Spark 4 stateful API (named ValueState + TTL + timers) must
    // produce the same totals as the legacy processor over the same
    // batches — pinning the migration path. TWS requires the RocksDB
    // state store provider.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = memStream[Event]
    val out = sinkName()
    try {
      val q = StreamOps.runningUserTotalsTws(ms.toDS())
        .writeStream.format("memory").queryName(out).outputMode("update").start()
      try {
        ms.addData(
          Event(1L, ts("10:00"), 100L, "click", 1.0),
          Event(2L, ts("10:01"), 100L, "view", 2.0),
          Event(3L, ts("10:02"), 200L, "click", 5.0))
        q.processAllAvailable()
        ms.addData(Event(4L, ts("10:03"), 100L, "purchase", 4.0))
        q.processAllAvailable()
        val latest = spark.table(out)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .groupBy(_._1).map { case (u, rows) => u -> rows.last }
        // identical to the mapGroupsWithState expectations above
        assert(latest(100L) == ((100L, 3L, 7.0)))
        assert(latest(200L) == ((200L, 1L, 5.0)))
      } finally q.stop()
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("sessionCloseTws: event-time timer closes the session exactly once on watermark") {
    // the timer half of the transformWithState API: input batches only
    // re-arm the timer; the summary emits from handleExpiredTimer when
    // the watermark passes last-event + gap, and an open session stays
    // silent. Gap 2 min, lateness 10 s.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = memStream[Event]
    val out = sinkName()
    try {
      val q = StreamOps.sessionCloseTws(ms.toDS(), gapMs = 120000L)
        .writeStream.format("memory").queryName(out).outputMode("append").start()
      try {
        ms.addData(
          Event(1L, ts("10:00"), 100L, "click", 1.0),
          Event(2L, ts("10:01"), 100L, "view", 2.0))
        q.processAllAvailable()
        assert(spark.table(out).count() == 0, "open session must not emit")
        // within the gap: extends the session, re-arms the timer
        ms.addData(Event(3L, ts("10:02"), 100L, "purchase", 4.0))
        q.processAllAvailable()
        assert(spark.table(out).count() == 0, "extended session must not emit")
        // far-future event advances the watermark past 10:04 -> timer fires
        ms.addData(Event(4L, ts("10:30"), 200L, "click", 5.0))
        q.processAllAvailable()
        val rows = spark.table(out)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        assert(rows.toSeq == Seq((100L, 3L, 7.0, ts("10:02").getTime)),
          s"exactly one closed session expected, got ${rows.toSeq}")
        // user 200's session (timer 10:32) is still open at watermark 10:29:50
      } finally q.stop()
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("dedupStreamByFingerprint: same-sketch docs collapse, distinct ones survive") {
    val ms = memStream[StreamSpecDoc]
    val out = sinkName()
    val q = StreamOps.dedupStreamByFingerprint(ms.toDS().toDF(), "ts", "text", "10 minutes")
      .writeStream.format("memory").queryName(out).outputMode("append").start()
    try {
      ms.addData(
        StreamSpecDoc(1L, ts("10:00"), "the quick brown fox"),
        StreamSpecDoc(2L, ts("10:01"), "the  QUICK   brown fox"), // same tokens -> same sketch
        StreamSpecDoc(3L, ts("10:02"), "a completely different document"))
      q.processAllAvailable()
      val ids = spark.table(out).select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 3L), s"fingerprint dedup kept: $ids")
    } finally q.stop()
  }

  test("decontaminateStream: blocklisted docs never emit, across micro-batches") {
    import spark.implicits._
    // static blocklist, normalized-digest matching: case/whitespace
    // variants of a blocked text must still be caught (batch-q53 parity)
    val blocklist = Seq("the forbidden benchmark answer", "another leaked prompt")
      .toDF("text")
    val ms = memStream[StreamSpecDoc]
    val out = sinkName()
    val q = StreamOps.decontaminateStream(ms.toDS().toDF(), "text", blocklist, "text")
      .writeStream.format("memory").queryName(out).outputMode("append").start()
    try {
      ms.addData(
        StreamSpecDoc(1L, ts("10:00"), "a clean training document"),
        StreamSpecDoc(2L, ts("10:01"), "the forbidden benchmark answer"))
      q.processAllAvailable()
      ms.addData( // a later batch re-delivers blocked content, differently cased
        StreamSpecDoc(3L, ts("10:02"), "The  FORBIDDEN benchmark answer"),
        StreamSpecDoc(4L, ts("10:03"), "another clean document"),
        StreamSpecDoc(5L, ts("10:04"), "Another   Leaked Prompt"))
      q.processAllAvailable()
      val ids = spark.table(out).select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 4L), s"decontamination emitted blocklisted docs: $ids")
    } finally q.stop()
  }

  test("observe: pipeline telemetry counters surface through the batch run") {
    val obs = new org.apache.spark.sql.Observation("graft_metrics")
    import org.apache.spark.sql.functions._
    val df = spark.range(1000).toDF("id")
      .observe(obs, count(lit(1)).as("rows_in"), sum(col("id")).as("id_sum"))
      .where(col("id") % 2 === 0)
    assert(df.count() == 500)
    val m = obs.get
    assert(m("rows_in") == 1000L && m("id_sum") == 499500L,
      s"observed metrics wrong: $m")
  }

  test("stream-static enrichment: events join a broadcast dimension, no stream state") {
    import spark.implicits._
    val dim = Seq((100L, "gold"), (200L, "basic")).toDF("user_id", "tier")
    val ms = memStream[Event]
    val out = sinkName()
    val q = ms.toDS().toDF()
      .join(broadcast(dim), "user_id") // static side re-broadcast per batch
      .select("event_id", "tier")
      .writeStream.format("memory").queryName(out).outputMode("append").start()
    try {
      ms.addData(
        Event(1L, ts("10:00"), 100L, "click", 1.0),
        Event(2L, ts("10:01"), 300L, "click", 1.0), // no dim row -> dropped (inner)
        Event(3L, ts("10:02"), 200L, "view", 2.0))
      q.processAllAvailable()
      val got = spark.table(out).collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((1L, "gold"), (3L, "basic")))
    } finally q.stop()
  }

  test("RocksDB state store provider runs the stateful aggregation (scale-grade state)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = memStream[Event]
    val out = sinkName()
    try {
      val q = StreamOps.tumblingCounts(ms.toDS().toDF(), "ts", "10 minutes",
          Seq(col("event_type")), lateness = "0 seconds")
        .writeStream.format("memory").queryName(out).outputMode("update").start()
      try {
        ms.addData(
          Event(1L, ts("10:01"), 1L, "click", 1.0),
          Event(2L, ts("10:02"), 2L, "click", 1.0),
          Event(3L, ts("10:03"), 3L, "view", 1.0))
        q.processAllAvailable()
        val counts = spark.table(out)
          .select("event_type", "cnt").collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(counts == Map("click" -> 2L, "view" -> 1L),
          s"RocksDB-backed aggregation wrong: $counts")
      } finally q.stop()
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("checkpoint restart: windowed state survives a stop/start cycle (file sink)") {
    // memory sink can't recover from a checkpoint; the parquet sink can.
    // Window W1 collects two events BEFORE the restart and only closes
    // (append emission) AFTER it — the emitted count proves the window
    // state crossed the stop/start boundary.
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val dest = java.nio.file.Files.createTempDirectory("graft-ckpt-out").toString
    val ms = memStream[Event]
    def start() = StreamOps.tumblingCounts(ms.toDS().toDF(), "ts", "10 minutes",
        Seq(col("event_type")), lateness = "0 seconds")
      .select(col("window.start").cast("long").as("ws"), col("event_type"), col("cnt"))
      .writeStream.format("parquet")
      .option("path", dest)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val q1 = start()
    try {
      ms.addData(
        Event(1L, ts("10:01"), 100L, "click", 1.0),
        Event(2L, ts("10:03"), 200L, "click", 1.0))
      q1.processAllAvailable() // W1 still open: nothing emitted yet
    } finally q1.stop()

    val q2 = start()
    try {
      // advances the watermark past W1's end -> W1 closes and emits
      ms.addData(Event(3L, ts("10:25"), 300L, "click", 1.0))
      q2.processAllAvailable()
      val counts = spark.read.parquet(dest)
        .select("event_type", "cnt").collect()
        .map(r => r.getString(0) -> r.getLong(1))
      assert(counts.contains("click" -> 2L),
        s"window state lost across restart; emitted: ${counts.toSeq}")
    } finally q2.stop()
  }

  test("spendAlerts: flatMapGroupsWithState emits 0..N rows per group per batch") {
    val ms = memStream[Event]
    val out = sinkName()
    val q = StreamOps.spendAlerts(ms.toDS(), threshold = 5.0)
      .writeStream.format("memory").queryName(out).outputMode("append").start()
    try {
      // user 100: 1+2 = 3 -> no crossing; user 200: 12 -> crosses 5 and 10
      ms.addData(
        Event(1L, ts("10:00"), 100L, "click", 1.0),
        Event(2L, ts("10:01"), 100L, "view", 2.0),
        Event(3L, ts("10:02"), 200L, "click", 12.0))
      q.processAllAvailable()
      // user 100: 3 -> 9 crosses 5 exactly once (state carried across batches)
      ms.addData(Event(4L, ts("10:03"), 100L, "purchase", 6.0))
      q.processAllAvailable()
      val rows = spark.table(out)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows == Set((200L, 1L, 5.0), (200L, 1L, 10.0), (100L, 3L, 5.0)),
        s"unexpected alert set: $rows")
    } finally q.stop()
  }

  test("parquet readStream over the events fixture matches the batch answer") {
    // the production source shape: a directory of parquet files consumed
    // incrementally (maxFilesPerTrigger) — results must equal the batch
    // run of the SAME transform over the same data
    // stream sources read DIRECTORIES; stage the fixture into one via
    // Sources.table so ts is the canonical epoch-nanos long regardless of
    // the fixture generation's physical parquet type
    val norm = graft.sources.Sources.table(spark, "/root/testdata/sf0.001", "events")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    norm.coalesce(1).write.mode("overwrite").parquet(dir)
    val schema = norm.schema
    val streamDf = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet")
      .parquet(dir)
      .select(timestamp_micros(expr("ts div 1000")).as("tsc"), col("event_type"))
    val out = sinkName()
    val q = StreamOps.tumblingCounts(streamDf, "tsc", "1 day", Seq(col("event_type")), "0 seconds")
      .writeStream.format("memory").queryName(out).outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table(out)
        .select(col("window.start"), col("event_type"), col("cnt"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val batch = StreamOps.tumblingCounts(
        norm
          .select(timestamp_micros(expr("ts div 1000")).as("tsc"), col("event_type")),
        "tsc", "1 day", Seq(col("event_type")))
        .select(col("window.start"), col("event_type"), col("cnt"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("Trigger.AvailableNow: drain-and-stop incremental runs resume from the checkpoint") {
    // the production incremental-batch pattern: a scheduled job starts,
    // drains everything new since the last run, and STOPS ON ITS OWN —
    // each run advances the checkpoint, so work is proportional to new
    // files, not corpus size. Two runs over a growing directory must
    // together equal one batch pass over the final directory.
    import org.apache.spark.sql.streaming.Trigger
    val src = "/root/testdata/sf0.001/events.parquet"
    val dir = java.nio.file.Files.createTempDirectory("graft-avnow-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-avnow-ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-avnow-out").toString
    val full = spark.read.parquet(src)
    val schema = full.schema
    full.where(col("event_id") % 2 === 0)
      .write.mode("overwrite").parquet(s"$dir/batch=0")
    def drain(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet").parquet(s"$dir/*")
        .select(col("event_id"), col("event_type"))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      // AvailableNow terminates by itself once the backlog is drained —
      // a timeout here means the trigger never finished
      try assert(q.awaitTermination(120000), "AvailableNow run did not self-terminate")
      finally q.stop() // no-op after normal termination; frees a wedged run
    }
    drain()
    val afterFirst = spark.read.parquet(outDir).count()
    full.where(col("event_id") % 2 === 1)
      .write.mode("overwrite").parquet(s"$dir/batch=1")
    drain()
    val got = spark.read.parquet(outDir)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val want = full.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want, s"incremental union != batch: ${got.size} vs ${want.size}")
    // the second run only processed the new files
    assert(afterFirst == want.count(_ % 2 == 0),
      s"first drain wrote $afterFirst rows, expected the even half")
  }

  test("streamRangeJoin: stream-stream join within the event-time range") {
    val purchases = memStream[(Timestamp, Long, Long)]
    val clicks = memStream[(Timestamp, Long, Long)]
    val out = sinkName()
    val q = StreamOps.streamRangeJoin(
        purchases.toDF.toDF("pts", "puser", "pid"),
        clicks.toDF.toDF("cts", "cuser", "cid"),
        "puser", "cuser", "pts", "cts", windowBefore = "10 minutes", lateness = "1 minute")
      .select("pid", "cid")
      .writeStream.format("memory").queryName(out).outputMode("append").start()
    try {
      clicks.addData((ts("10:00"), 1L, 100L), (ts("10:20"), 1L, 101L), (ts("10:02"), 2L, 200L))
      purchases.addData((ts("10:05"), 1L, 500L)) // matches click 100 (5 min before), not 101 (after)
      q.processAllAvailable()
      // advance both watermarks so results flush
      clicks.addData((ts("11:00"), 9L, 999L))
      purchases.addData((ts("11:00"), 9L, 998L))
      q.processAllAvailable()
      val rows = spark.table(out).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows.contains((500L, 100L)), s"expected (500,100) in $rows")
      assert(!rows.contains((500L, 101L)), "future click must not match")
      assert(!rows.contains((500L, 200L)), "other user's click must not match")
    } finally q.stop()
  }

  test("streamRangeJoinLeftOuter: unmatched left emits null-extended after expiry") {
    val purchases = memStream[(Timestamp, Long, Long)]
    val clicks = memStream[(Timestamp, Long, Long)]
    val out = sinkName()
    val q = StreamOps.streamRangeJoinLeftOuter(
        purchases.toDF.toDF("pts", "puser", "pid"),
        clicks.toDF.toDF("cts", "cuser", "cid"),
        "puser", "cuser", "pts", "cts", windowBefore = "10 minutes", lateness = "1 minute")
      .select("pid", "cid")
      .writeStream.format("memory").queryName(out).outputMode("append").start()
    try {
      clicks.addData((ts("10:00"), 1L, 100L))
      purchases.addData((ts("10:05"), 1L, 500L)) // matched: click 5 min before
      purchases.addData((ts("10:05"), 2L, 600L)) // user 2 never clicks
      q.processAllAvailable()
      // the null-extension CANNOT have emitted yet: non-arrival is only
      // certified once the watermark passes pts + lateness
      val early = spark.table(out).collect().map(_.getLong(0)).toSet
      assert(!early.contains(600L),
        s"unmatched row emitted before the watermark certified it: $early")
      // push both watermarks far past 10:05 + range + lateness
      clicks.addData((ts("12:00"), 9L, 999L))
      purchases.addData((ts("12:00"), 9L, 998L))
      q.processAllAvailable()
      val rows = spark.table(out).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(rows.contains((500L, 100L)), s"matched pair missing: $rows")
      assert(rows.contains((600L, -1L)), s"null-extended unmatched row missing: $rows")
    } finally q.stop()
  }

  test("streamRangeJoinFullOuter: unmatched rows from BOTH sides emit null-extended") {
    val purchases = memStream[(Timestamp, Long, Long)]
    val clicks = memStream[(Timestamp, Long, Long)]
    val out = sinkName()
    val q = StreamOps.streamRangeJoinFullOuter(
        purchases.toDF.toDF("pts", "puser", "pid"),
        clicks.toDF.toDF("cts", "cuser", "cid"),
        "puser", "cuser", "pts", "cts", windowBefore = "10 minutes", lateness = "1 minute")
      .select("pid", "cid")
      .writeStream.format("memory").queryName(out).outputMode("append").start()
    try {
      clicks.addData((ts("10:00"), 1L, 100L)) // matched by purchase 500
      clicks.addData((ts("10:00"), 3L, 300L)) // user 3 never purchases
      purchases.addData((ts("10:05"), 1L, 500L))
      purchases.addData((ts("10:05"), 2L, 600L)) // user 2 never clicks
      q.processAllAvailable()
      // push both watermarks far past every row's expiry
      clicks.addData((ts("12:00"), 9L, 999L))
      purchases.addData((ts("12:00"), 9L, 998L))
      q.processAllAvailable()
      val rows = spark.table(out).collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
                   if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(rows.contains((500L, 100L)), s"matched pair missing: $rows")
      assert(rows.contains((600L, -1L)), s"left-unmatched row missing: $rows")
      assert(rows.contains((-1L, 300L)), s"right-unmatched row missing: $rows")
    } finally q.stop()
  }

  test("q68 pricing rollup as a watermarked stream over the lineitem fixture: batch == stream") {
    // the flagship batch rollup run continuously: the REAL sf0.001
    // lineitem rows arrive in shipdate order (the fixture's natural
    // cadence) across several micro-batches; per-window exact-integer
    // sums emit as the watermark closes each window. Parity is exact
    // because every aggregate is an integer — no accumulation-order
    // drift between the incremental and batch paths.
    val cols = Seq("l_returnflag", "l_linestatus", "l_shipdate",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val rows = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(cols.map(col): _*)
      .orderBy("l_shipdate")
      .as[StreamSpecLine].collect()
    val ms = memStream[StreamSpecLine]
    val out = sinkName()
    val q = StreamOps.pricingRollup(ms.toDS().toDF(), "l_shipdate",
        width = "90 days", lateness = "30 days")
      .writeStream.format("memory").queryName(out).outputMode("append").start()
    try {
      // in-order chunks: the watermark only rises between batches, so no
      // row is ever late; every window eventually closes via the sentinel
      rows.grouped(math.max(1, rows.length / 4)).foreach { chunk =>
        ms.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val sentinel = StreamSpecLine("ZZ", "Z", ts("23:59"), 0, 0, 0, 0)
        .copy(l_shipdate = Timestamp.valueOf("2005-01-01 00:00:00"))
      ms.addData(sentinel) // watermark -> 2004-12-02: closes every real window
      q.processAllAvailable()

      def rollupSet(df: org.apache.spark.sql.DataFrame) = df
        .where(col("l_returnflag") =!= "ZZ")
        .select(col("window.start"), col("l_returnflag"), col("l_linestatus"),
          col("sum_qty"), col("sum_base_cents"), col("sum_disc_e4"),
          col("sum_charge_e6"), col("cnt"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getString(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSet

      val streamed = rollupSet(spark.table(out))
      val batch = rollupSet(StreamOps.pricingRollup(
        rows.toIndexedSeq.toDS().toDF(), "l_shipdate", "90 days", "30 days"))
      assert(streamed.nonEmpty && streamed == batch,
        s"stream/batch rollup diverged: ${streamed.size} vs ${batch.size} windows")

      // and the emitted windows RE-AGGREGATE to the flagship totals —
      // exact-integer sums make the incremental path bit-identical
      val totals = spark.table(out).where(col("l_returnflag") =!= "ZZ")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("sum_charge_e6").as("charge"), sum("cnt").as("n"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      val batchTotals = rows.toIndexedSeq.toDS().toDF()
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum((round(col("l_extendedprice") * 100) *
          round((lit(1) - col("l_discount")) * 100) *
          round((lit(1) + col("l_tax")) * 100)).cast("long")).as("charge"),
          count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(totals == batchTotals, "windowed stream totals diverged from the batch rollup")
    } finally q.stop()
  }

  test("sketchStream appends the persisted sketch table; rollup == direct batch sketch") {
    // The streaming half of SketchOps: hourly HLL sketch rows emitted on
    // watermark close, across several micro-batches with out-of-order
    // (but in-lateness) arrivals. The emitted rows, merged by
    // SketchOps.rollup, must estimate IDENTICALLY to one batch sketch
    // over the same events — register max-merge is order-independent.
    val ms = memStream[(Timestamp, Long)]
    val out = sinkName()
    val q = StreamOps.sketchStream(
        ms.toDF.toDF("ts", "user_id"), "ts", "user_id", "1 hour", "10 minutes")
      .writeStream.format("memory").queryName(out).outputMode("append").start()
    val users = (0L until 400L).map(u => (ts(f"10:${u % 50}%02d"), u % 97)) ++
      (0L until 400L).map(u => (ts(f"11:${(u * 7) % 50}%02d"), u % 113))
    try {
      ms.addData(users.take(300): _*)
      q.processAllAvailable()
      ms.addData(users.drop(300): _*) // second batch re-opens hour 10 within lateness
      q.processAllAvailable()
      ms.addData((ts("13:30"), 1L)) // advance watermark, close 10:00 and 11:00
      q.processAllAvailable()

      val table = spark.table(out).where(col("bucket") < ts("13:00"))
      assert(table.count() == 2, "expected one sketch row per closed hourly window")
      val merged = graft.operators.SketchOps.rollup(table, lit(1))
        .head().getAs[Long]("approx_distinct")
      val direct = users.toDF("ts", "user_id")
        .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id")))).head().getLong(0)
      assert(merged == direct,
        s"streamed sketch rows diverged from direct batch sketch: $merged vs $direct")
    } finally q.stop()
  }

  test("histStream appends the quantile-histogram table; rollup == direct batch sketch") {
    val ms = memStream[(Timestamp, Long)]
    val out = sinkName()
    val q = StreamOps.histStream(
        ms.toDF.toDF("ts", "v"), "ts", "v", "1 hour", "10 minutes")
      .writeStream.format("memory").queryName(out).outputMode("append").start()
    // skewed positive values across two hours, split over two batches
    val vals = (1L to 800L).map(i => (ts(f"10:${i % 50}%02d"), i * i % 9973 + 1)) ++
      (1L to 800L).map(i => (ts(f"11:${(i * 3) % 50}%02d"), i * 7 % 5003 + 1))
    try {
      ms.addData(vals.take(1000): _*)
      q.processAllAvailable()
      ms.addData(vals.drop(1000): _*)
      q.processAllAvailable()
      ms.addData((ts("13:30"), 1L)) // close both hourly windows
      q.processAllAvailable()

      val table = spark.table(out).where(col("bucket") < ts("13:00"))
      val qs = Seq((50, 100), (95, 100), (99, 100))
      val streamed = graft.operators.HistSketch.rollup(table, lit(1), qs).head()
      val direct = graft.operators.HistSketch.rollup(
        graft.operators.HistSketch.sketchBy(
          vals.toDF("ts", "v"), lit(0), col("v")), lit(1), qs).head()
      assert(streamed == direct,
        s"streamed histogram diverged from direct batch sketch: $streamed vs $direct")
      assert(streamed.getLong(1) == 1600L)
    } finally q.stop()
  }

  test("funnelStream: exactly-once completion on the third stage; partial funnels stay silent") {
    import StreamOps.Event
    val ms = memStream[Event]
    val out = sinkName()
    val q = StreamOps.funnelStream(ms.toDS())
      .writeStream.format("memory").queryName(out).outputMode("append").start()
    def ev(id: Long, hhmm: String, u: Long, t: String) = Event(id, ts(hhmm), u, t, 0.0)
    try {
      // user 1 progresses across batches; user 2 clicks before viewing
      // (click must NOT count); user 3 never purchases
      ms.addData(
        ev(1, "10:00", 1L, "view"), ev(2, "10:01", 1L, "click"),
        ev(3, "10:00", 2L, "click"), ev(4, "10:01", 2L, "view"),
        ev(5, "10:00", 3L, "view"), ev(6, "10:01", 3L, "click"))
      q.processAllAvailable()
      assert(spark.table(out).count() == 0, "no funnel is complete yet")

      ms.addData(ev(7, "10:05", 1L, "purchase"), ev(8, "10:05", 2L, "purchase"))
      q.processAllAvailable()
      val rows = spark.table(out)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // only user 1 completed: user 2's click preceded its view
      assert(rows.map(_._1).toSet == Set(1L), s"wrong completions: ${rows.toSeq}")
      val (_, v, c, p) = rows.head
      assert(v < c && c < p, "stage timestamps must be strictly ordered")

      // a second purchase must not re-emit (exactly-once per user)
      ms.addData(ev(9, "10:30", 1L, "purchase"))
      q.processAllAvailable()
      assert(spark.table(out).count() == 1, "completion emitted more than once")

      // user 2's view (10:01) is on record, so a NEW click after it and
      // a purchase after that complete the funnel late
      ms.addData(ev(10, "10:10", 2L, "click"), ev(11, "10:11", 2L, "purchase"))
      q.processAllAvailable()
      assert(spark.table(out).collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    } finally q.stop()
  }

  test("funnelStreamBuffered: batch parity under adversarially reversed micro-batch delivery") {
    import StreamOps.Event
    def tsU(hhmm: String, us: Int): Timestamp = {
      val t = Timestamp.valueOf(s"2024-01-01 $hhmm:00"); t.setNanos(us * 1000); t
    }
    def us(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos % 1000000) / 1000
    val ms = memStream[Event]
    val out = sinkName()
    val outEager = sinkName()
    val q = StreamOps.funnelStreamBuffered(ms.toDS(), lateness = "30 minutes")
      .writeStream.format("memory").queryName(out).outputMode("append").start()
    // the eager variant reads the SAME stream: its documented divergence
    // under cross-batch reordering is what the buffered form closes
    val qe = StreamOps.funnelStream(ms.toDS())
      .writeStream.format("memory").queryName(outEager).outputMode("append").start()
    def ev(id: Long, t: Timestamp, u: Long, tp: String) = Event(id, t, u, tp, 0.0)
    try {
      // u1: stages delivered in REVERSE batch order (purchase first);
      // u2: a later view arrives BEFORE the true first view, so the eager
      //     machine wires t1=10:02 and then rejects the 10:01 click;
      // u3: never completes; u4: stages distinct only at MICROsecond
      //     granularity (pins the getNanos fix), also delivered reversed.
      ms.addData(
        ev(103, ts("10:10"), 1L, "purchase"),
        ev(202, ts("10:02"), 2L, "view"), ev(204, ts("10:03"), 2L, "purchase"),
        ev(403, tsU("10:00", 5), 4L, "purchase"))
      q.processAllAvailable(); qe.processAllAvailable()
      ms.addData(
        ev(102, ts("10:05"), 1L, "click"),
        ev(203, ts("10:01"), 2L, "click"),
        ev(402, tsU("10:00", 3), 4L, "click"))
      q.processAllAvailable(); qe.processAllAvailable()
      ms.addData(
        ev(101, ts("10:00"), 1L, "view"),
        ev(201, ts("10:00"), 2L, "view"),
        ev(301, ts("10:00"), 3L, "view"),
        ev(401, tsU("10:00", 1), 4L, "view"))
      q.processAllAvailable(); qe.processAllAvailable()
      assert(spark.table(out).count() === 0, "nothing final until the watermark passes t3")

      // watermark pushers (one batch to advance it, one to fire timers)
      ms.addData(ev(901, ts("11:00"), 99L, "view"))
      q.processAllAvailable(); qe.processAllAvailable()
      ms.addData(ev(902, ts("11:05"), 99L, "click"))
      q.processAllAvailable(); qe.processAllAvailable()

      val got = spark.table(out)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      // the batch q121 staged-min answer, in true micros
      val expected = Map(
        1L -> (us(ts("10:00")), us(ts("10:05")), us(ts("10:10"))),
        2L -> (us(ts("10:00")), us(ts("10:01")), us(ts("10:03"))),
        4L -> (us(tsU("10:00", 1)), us(tsU("10:00", 3)), us(tsU("10:00", 5))))
      assert(got === expected, s"buffered funnel diverged from batch: $got")
      // exactly-once: a replayed later purchase must not re-emit
      ms.addData(ev(104, ts("10:20"), 1L, "purchase"))
      q.processAllAvailable()
      assert(spark.table(out).count() === 3)
      // and the eager machine provably CANNOT complete any of these
      // (every user's stages arrived in reverse batch order)
      assert(spark.table(outEager).count() === 0,
        "delivery was not adversarial — eager funnel completed")
    } finally { q.stop(); qe.stop() }
  }

  test("funnelStreamBuffered: buffered state (incl. the event tail) survives a checkpoint restart") {
    import StreamOps.Event
    val ckpt = java.nio.file.Files.createTempDirectory("graft-funnel-ckpt").toString
    val dest = java.nio.file.Files.createTempDirectory("graft-funnel-out").toString
    val ms = memStream[Event]
    def start() = StreamOps.funnelStreamBuffered(ms.toDS(), lateness = "30 minutes")
      .writeStream.format("parquet")
      .option("path", dest).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val q1 = start()
    try {
      // the LATER stages arrive before the restart; the view only after —
      // the buffered tail (purchase, click) must cross the stop/start
      ms.addData(Event(1L, ts("10:10"), 1L, "purchase", 0.0))
      q1.processAllAvailable()
      ms.addData(Event(2L, ts("10:05"), 1L, "click", 0.0))
      q1.processAllAvailable()
    } finally q1.stop()

    val q2 = start()
    try {
      ms.addData(Event(3L, ts("10:00"), 1L, "view", 0.0))
      q2.processAllAvailable()
      ms.addData(Event(4L, ts("11:00"), 99L, "view", 0.0)) // watermark push
      q2.processAllAvailable()
      ms.addData(Event(5L, ts("11:05"), 99L, "click", 0.0)) // timer batch
      q2.processAllAvailable()
      val rows = spark.read.parquet(dest)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      def us(hhmm: String) = ts(hhmm).getTime * 1000L
      assert(rows.toSet === Set((1L, us("10:00"), us("10:05"), us("10:10"))),
        s"buffered funnel state lost across restart: ${rows.toSeq}")
    } finally q2.stop()
  }

  test("funnelStreamBuffered over the events fixture == the batch q121 staged-min answer") {
    import StreamOps.Event
    // the real fixture through the real file-stream path: every per-user
    // (t1, t2, t3) triple the stream emits must equal the batch staged-min
    // formulation (q121's law) over the same events
    val raw = graft.sources.Sources.table(spark, "/root/testdata/sf0.001", "events")
    val toMicros = expr("ts div 1000") // Sources.table canonicalizes ts to epoch-nanos long
    // batch expected: staged mins in micros
    val e = raw.select(col("user_id"), toMicros.as("tus"), col("event_type"))
    val s1 = e.where(col("event_type") === "view").groupBy("user_id").agg(min("tus").as("t1"))
    val s2 = e.join(s1, "user_id")
      .where(col("event_type") === "click" && col("tus") > col("t1"))
      .groupBy("user_id").agg(min("tus").as("t2"))
    val s3 = e.join(s2, "user_id")
      .where(col("event_type") === "purchase" && col("tus") > col("t2"))
      .groupBy("user_id").agg(min("tus").as("t3"))
    val expected = s1.join(s2, "user_id").join(s3, "user_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(expected.nonEmpty, "fixture has no completed funnels — test is vacuous")

    // stream the fixture (one file), then two far-future dummy files: the
    // first advances the watermark past every real event, the second runs
    // the batch in which the event-time timers fire
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel-fixture").toString
    // stage the canonicalized (long-ts) fixture so the dummy files below —
    // written with long ts — share one physical schema with the real data
    raw.coalesce(1).write.mode("overwrite").parquet(dir)
    val maxNanos = raw.agg(max("ts")).head.getLong(0)
    def dummy(name: String, id: Long): Unit =
      spark.range(1).select(
          lit(900000000L + id).as("event_id"),
          lit(maxNanos + 7200L * 1000000000L + id).as("ts"),
          lit(999999L + id).as("user_id"),
          lit("view").as("event_type"),
          lit(0.0).as("value"))
        .write.mode("overwrite").parquet(s"$dir/../${name}_stage")
        // write to a staging dir then move the file in, so the stream
        // never reads a half-written file
    import spark.implicits._
    val schema = raw.schema
    val streamDs = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .select(col("event_id"), timestamp_micros(expr("ts div 1000")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val out = sinkName()
    val q = StreamOps.funnelStreamBuffered(streamDs, lateness = "1 minute")
      .writeStream.format("memory").queryName(out).outputMode("append").start()
    try {
      q.processAllAvailable()
      Seq("d1", "d2").zipWithIndex.foreach { case (name, i) =>
        dummy(name, i)
        val staged = java.nio.file.Files.list(
            java.nio.file.Paths.get(s"$dir/../${name}_stage"))
          .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
        java.nio.file.Files.move(staged, java.nio.file.Paths.get(dir, s"dummy-$name.parquet"))
        q.processAllAvailable()
      }
      val got = spark.table(out)
        .where(col("user_id") < 999999L) // drop the dummy users
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(got === expected,
        s"stream vs batch mismatch: ${got.size} streamed vs ${expected.size} expected")
    } finally q.stop()
  }

  test("state rescale: restart from checkpoint under a different shuffle-partition count") {
    // The local proxy for an executor rescale: stateful-operator state is
    // hash-partitioned by numShufflePartitions FIXED AT FIRST START (in
    // the checkpoint's offset log); a restart under a different session
    // shuffle-partition setting must keep reading/writing that state
    // correctly — windows opened before the restart close with complete
    // counts after it, and no state is orphaned or double-counted.
    val ckpt = java.nio.file.Files.createTempDirectory("graft-rescale").toString
    val dest = java.nio.file.Files.createTempDirectory("graft-rescale-out").toString
    val ms = memStream[Event]
    def start() = StreamOps.tumblingCounts(ms.toDS().toDF(), "ts", "10 minutes",
        Seq(col("event_type")), lateness = "0 seconds")
      .select(col("window.start").cast("long").as("ws"), col("event_type"), col("cnt"))
      .writeStream.format("parquet")
      .option("path", dest)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val q1 = start()
    try {
      ms.addData(
        Event(1L, ts("10:01"), 100L, "click", 1.0),
        Event(2L, ts("10:03"), 200L, "click", 1.0),
        Event(3L, ts("10:04"), 300L, "view", 1.0))
      q1.processAllAvailable() // windows still open; state only
    } finally q1.stop()

    try {
      spark.conf.set("spark.sql.shuffle.partitions", (before.toInt * 3 + 1).toString)
      val q2 = start()
      try {
        // one more in-window event plus the watermark push that closes W1
        ms.addData(Event(4L, ts("10:06"), 400L, "click", 1.0))
        q2.processAllAvailable()
        ms.addData(Event(5L, ts("10:25"), 500L, "click", 1.0))
        q2.processAllAvailable()
        val counts = spark.read.parquet(dest)
          .select("event_type", "cnt").collect()
          .map(r => r.getString(0) -> r.getLong(1)).toSet
        assert(counts.contains("click" -> 3L) && counts.contains("view" -> 1L),
          s"state lost or double-counted across the rescale restart: $counts")
      } finally q2.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("lakeMergeSink: streaming upsert into a LakeTable; replay converges (idempotent merge)") {
    import graft.operators.LakeTable
    val root = java.nio.file.Files.createTempDirectory("graft-lake-sink").toString + "/t"
    // entity table: latest value per user, partitioned by user bucket
    val base = Seq((1L, "0", 10.0, 100L), (2L, "0", 20.0, 100L), (3L, "1", 30.0, 100L))
      .toDF("user_id", "pt", "value", "uts")
    LakeTable.init(spark, root, base, "pt")

    val ms = memStream[(Long, String, Double, Long)]
    def start() = StreamOps.lakeMergeSink(
        ms.toDF.toDF("user_id", "pt", "value", "uts"),
        root, Seq("user_id"), "pt", "uts")
      .outputMode("update").start()

    def table(): Set[(Long, String, Double, Long)] =
      LakeTable.read(spark, root)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSet

    val q1 = start()
    try {
      // one batch carrying TWO updates for user 1 (latest-per-key collapse),
      // one update for user 3, and a brand-new user 5 in a new partition
      ms.addData((1L, "0", 11.0, 200L), (1L, "0", 12.0, 300L),
        (3L, "1", 33.0, 250L), (5L, "2", 50.0, 200L))
      q1.processAllAvailable()
    } finally q1.stop()
    val afterBatch1 = table()
    assert(afterBatch1 === Set(
      (1L, "0", 12.0, 300L), (2L, "0", 20.0, 100L),
      (3L, "1", 33.0, 250L), (5L, "2", 50.0, 200L)))

    // restart WITHOUT a checkpoint: the memory stream replays everything —
    // the at-least-once path. The merge must converge, not double-apply.
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(table() === afterBatch1, "replayed batch changed the table — merge not idempotent")
      // and new data still lands after the replay
      ms.addData((2L, "0", 22.0, 400L))
      q2.processAllAvailable()
      assert(table() === afterBatch1 - ((2L, "0", 20.0, 100L)) + ((2L, "0", 22.0, 400L)))
    } finally q2.stop()
  }

  test("lakeAppendSink: fact-stream appends; replayed micro-batch skipped via txn id") {
    import graft.operators.LakeTable
    val root = java.nio.file.Files.createTempDirectory("graft-lake-append").toString + "/t"
    val base = Seq((1L, "0", 10.0)).toDF("event_id", "pt", "value")
    LakeTable.init(spark, root, base, "pt")

    val ms = memStream[(Long, String, Double)]
    def start() = StreamOps.lakeAppendSink(
      ms.toDF.toDF("event_id", "pt", "value"), root, appId = "test-append").start()

    def count(): Long = LakeTable.read(spark, root).count()

    val q1 = start()
    try {
      ms.addData((2L, "0", 20.0), (3L, "1", 30.0))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(count() === 3)

    // restart WITHOUT a checkpoint: the memory stream replays batch 0
    // under the SAME batchId — the txn watermark recognizes it and the
    // blind insert must NOT double-apply
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(count() === 3, "replayed micro-batch double-inserted — txn id not honored")
      // new data (a later batchId) still lands
      ms.addData((4L, "1", 40.0))
      q2.processAllAvailable()
      assert(count() === 4)
    } finally q2.stop()
    // the sum pins content, not just cardinality
    assert(LakeTable.read(spark, root).agg(sum("value")).head.getDouble(0) === 100.0)
  }

  test("the same tumbling transform runs in batch mode (unified API)") {
    val batch = Seq(
      (ts("10:01"), "a"), (ts("10:02"), "a"), (ts("10:30"), "b")).toDF("ts", "etype")
    val got = StreamOps.tumblingCounts(batch, "ts", "10 minutes", Seq(col("etype")))
      .select(col("window.start"), col("etype"), col("cnt"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((ts("10:00"), "a", 2L), (ts("10:30"), "b", 1L)))
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, ListState, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, Trigger, ValueState}
import org.apache.spark.sql.types._

/** Structured Streaming re-expression of the reference's incremental
  * semantics (SURVEY.md §2.9) plus the event-time surface the reference
  * lacks.
  *
  * I1 (new-file detection with durable state — /root/reference/dags/
  * modules/tanimoto.py:17-68): the reference lists the input dir, anti-
  * joins against a `used_input_files` table, and records newly seen
  * files. A Structured Streaming file source with a checkpoint IS that
  * state machine, natively exactly-once: the checkpoint's file log
  * replaces `used_input_files`, and `Trigger.AvailableNow` reproduces
  * the "drain whatever is new, then stop" batch-per-cron-tick behavior.
  *
  * The batch twins of these aggregations live in graft.queries.Events
  * (e1/e3) and are DuckDB-oracle-checked; StreamingSpec asserts
  * stream == batch on the same data, which transfers that oracle
  * coverage to the streaming path.
  */
object EventsStream extends Serializable {

  /** Canonical staged-file schema: `ts` as timestamp[us] with no TZ
    * annotation (TIMESTAMP_NTZ) — exactly how the current fixtures
    * store it, so staging a fixture file into a stream input dir is a
    * plain byte copy. A streaming source needs a FIXED schema up
    * front, so storage-type adaptivity lives in [[canonicalEventsFile]]
    * (which rewrites any other era's storage to this shape once per
    * process) rather than in the reader; [[readEvents]] then
    * normalizes `ts` to session-TZ TimestampType the same way
    * `graft.Tables.events` does for batch (session TZ pinned UTC ⇒
    * value-preserving).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private val canonicalCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Path of a single parquet file holding the sf dir's events in the
    * canonical staged shape ([[rawSchema]]). When the fixture already
    * stores µs-NTZ (the current era) this IS the fixture file — zero
    * copy cost; any other stored era (ns-int64, µs-UTC) is rewritten
    * through the adaptive batch reader once per (process, sf dir).
    */
  def canonicalEventsFile(spark: SparkSession, d: String): String =
    canonicalCache.computeIfAbsent(d, _ => {
      if (graft.Tables.eventsTsType(spark, d) == TimestampNTZType)
        s"$d/events.parquet"
      else {
        val dir = graft.Scratch.dir("events_canonical")
        graft.Tables.events(spark, d)
          .withColumn("ts", col("ts").cast(TimestampNTZType))
          .select("event_id", "ts", "user_id", "event_type", "value", "props")
          .coalesce(1).write.mode("overwrite").parquet(dir)
        new java.io.File(dir).listFiles()
          .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
      }
    })

  /** Streaming scan of a directory of canonically-staged event parquet
    * files — the file source tracks processed files in the checkpoint
    * (I1). `ts` comes out as session-TZ TimestampType, matching the
    * batch reader.
    */
  def readEvents(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "*.parquet")
    // rate limit = micro-batch boundary control: specs use it to force
    // state (and its timeouts) across batches instead of one big batch
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(dir)
      .withColumn("ts", col("ts").cast(TimestampType))
  }

  /** Tumbling 10-minute window counts/sums per event type with a
    * 30-minute watermark — the streaming twin of batch query e1.
    */
  def tumblingAgg(events: DataFrame): DataFrame =
    tumblingAggOn(events.withWatermark("ts", "30 minutes"))

  /** The aggregation alone, for streams that ALREADY carry a watermark
    * (a watermark may be defined only once per stream): the downstream
    * stage of a chained-stateful pipeline, e.g. dedup → windowed agg
    * (st4). */
  def tumblingAggOn(watermarked: DataFrame): DataFrame =
    watermarked
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("total"))

  /** Per-user session windows, 30-minute inactivity gap — the streaming
    * twin of batch query e3 (native session_window replaces the
    * lag+running-sum batch formulation).
    */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        date_format(min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"))
      .select(col("user_id"), col("session_start"), col("n_events"))

  /** Arbitrary-stateful running per-user totals via mapGroupsWithState —
    * the vehicle for custom state the built-in windows can't express
    * (SURVEY.md §2.9 ∅-list). State survives across micro-batches in the
    * checkpoint.
    */
  def runningUserTotals(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    case class UserState(n: Long, total: Double)
    val typed = events.select(col("user_id"), col("value"))
      .as[(Long, Double)]
    typed.groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), (Long, Long, Double)](
        GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[(Long, Double)]) =>
          val (pn, pt) = state.getOption.getOrElse((0L, 0.0))
          var n = pn
          var t = pt
          rows.foreach { r => n += 1; t += r._2 }
          state.update((n, t))
          (user, n, t)
      }
      .toDF("user_id", "n", "total")
  }

  /** Running per-user totals via the Spark 4 `transformWithState` API
    * (state v2) — the successor to mapGroupsWithState: NAMED typed
    * state slots with per-slot TTL, timers, composite Map/List state,
    * and state schema evolution. [[runningUserTotals]] is the legacy
    * twin; StreamingSpec asserts the two produce identical results on
    * the same files (single- AND multi-batch), so the engine's state-
    * API migration path is a proven no-op for this operator. The value
    * total accumulates as exact integer CENTS in state — double
    * addition would depend on within-batch arrival order, cents make
    * the emitted total order-independent and therefore oracle-
    * checkable (st12). Requires the RocksDB state store provider (the
    * v2 state layout is RocksDB-only) — see [[withRocksDb]].
    */
  def runningUserTotalsTws(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events.select(col("user_id"), col("value")).as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new RunningTotalsProcessor(),
        TimeMode.None(), OutputMode.Update())
      .map(r => (r._1, r._2, r._3 / 100.0))
      .toDF("user_id", "n", "total")
  }

  private class RunningTotalsProcessor
      extends StatefulProcessor[Long, (Long, Double), (Long, Long, Long)] {
    @transient private var totals: ValueState[(Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Long)]("totals",
        org.apache.spark.sql.Encoders.product[(Long, Long)], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
        timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
      val (pn, pc) = if (totals.exists()) totals.get() else (0L, 0L)
      var n = pn
      var cents = pc
      rows.foreach { r => n += 1; cents += math.round(r._2 * 100) }
      totals.update((n, cents))
      Iterator.single((key, n, cents))
    }
  }

  /** Run `body` with the RocksDB state store provider — required by
    * transformWithState; restored afterwards so the rest of the suite
    * keeps the default provider.
    */
  def withRocksDb[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  /** Custom sessionization via flatMapGroupsWithState — the
    * arbitrary-state twin of [[sessionAgg]], for session logic the
    * built-in session_window cannot express (here: a per-session value
    * total computed with exact decimal arithmetic, accumulated as
    * cents). The state machine is user code but the CLOSE semantics are
    * the engine's: `GroupStateTimeout.EventTimeTimeout` fires once the
    * watermark passes last-event + gap, so a session emits exactly when
    * session_window's append mode would emit it — and state is evicted
    * at the same moment, keeping per-key state bounded on an unbounded
    * stream. Sessions fully closed INSIDE a batch (a later event in the
    * same batch opens the next session) emit immediately without ever
    * parking in state.
    *
    * State per user: the single open session (startUs, lastUs, n,
    * totalCents). Micros-precision longs carry the event time so the
    * emitted session_start string keeps the storage precision (a
    * java.sql.Timestamp getTime round-trip would truncate to millis).
    */
  def sessionizeCustom(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val gapUs = 1800L * 1000000L
    // DateTimeFormatter is not Serializable; the holder ships instead
    // and each executor builds its own formatter on first use
    object fmt extends Serializable {
      @transient private lazy val f = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
        .withZone(java.time.ZoneOffset.UTC)
      def format(i: java.time.Instant): String = f.format(i)
    }
    val typed = events
      .withWatermark("ts", "30 minutes")
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("us"),
        col("value"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long, Long), (Long, String, Long, Double)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state) =>
          def emit(s: (Long, Long, Long, Long)) =
            (user, fmt.format(java.time.Instant.ofEpochSecond(
              s._1 / 1000000L, (s._1 % 1000000L) * 1000L)), s._3, s._4 / 100.0)
          if (state.hasTimedOut) {
            val out = state.getOption.map(emit).iterator
            state.remove()
            out
          } else {
            // rows within a batch are unordered; sessionization is a
            // time fold, so sort the (bounded) per-user batch slice
            val sorted = rows.map(r => (r._3, math.round(r._4 * 100)))
              .toIndexedSeq.sortBy(_._1)
            var open = state.getOption
            val closed = List.newBuilder[(Long, Long, Long, Long)]
            sorted.foreach { case (us, cents) =>
              open match {
                case Some((st, last, n, tot)) if us - last < gapUs =>
                  open = Some((math.min(st, us), math.max(last, us),
                    n + 1, tot + cents))
                case Some(sess) =>
                  closed += sess
                  open = Some((us, us, 1L, cents))
                case None =>
                  open = Some((us, us, 1L, cents))
              }
            }
            open.foreach { o =>
              state.update(o)
              state.setTimeoutTimestamp(o._2 / 1000L + 30L * 60L * 1000L)
            }
            closed.result().map(emit).iterator
          }
      }
      .toDF("user_id", "session_start", "n_events", "total_value")
  }

  /** Per-user inactivity report via the full Spark-4 stateful surface
    * (st13): event-time TIMERS evict a user's state once the watermark
    * passes last-event + gap, a LIST state holds the bounded last-`keep`
    * event history, a MAP state counts events per event_type, and a
    * value slot carries (n, lastUs). One report row set per user, per
    * eviction — the "user went quiet, summarize and forget them"
    * pattern that keeps per-key state bounded on an unbounded stream.
    * Output rows: (user_id, rk, event_id, n, n_types) — the user's
    * `keep` latest events by (ts, event_id) with their rank, the total
    * event count, and the distinct-type count. The watermark-advance
    * sentinel (user_id < 0) fires every real user's timer at
    * end-of-stream, so the batch oracle is exact. The sentinel is
    * dropped INSIDE the processor, not by a `.filter` here: Catalyst
    * pushes a user_id predicate BELOW the EventTimeWatermark node, so
    * a filtered sentinel would never reach the watermark collector and
    * the final timers would never fire (observed: the last 30 minutes
    * of users went unemitted).
    */
  def inactivityReportTws(spark: SparkSession, events: DataFrame,
      gapMs: Long = 30L * 60L * 1000L, keep: Int = 5): DataFrame = {
    import spark.implicits._
    events
      .withWatermark("ts", "30 minutes")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .transformWithState(new InactivityReportProcessor(gapMs, keep),
        TimeMode.EventTime(), OutputMode.Append())
      .toDF("user_id", "rk", "event_id", "n", "n_types")
  }

  /** The st13 state machine. Every input batch folds rows into the
    * three named slots and re-arms ONE event-time timer at the new
    * inactivity deadline (previous timers deleted — `listTimers` makes
    * the re-arm idempotent across batches); when the watermark passes
    * the deadline, `handleExpiredTimer` emits the report and CLEARS all
    * slots. The history is trimmed to the `keep` largest (us, event_id)
    * on every batch — top-K is an associative merge, so the kept set is
    * independent of how the stream was sliced into micro-batches, and
    * state stays bounded however long the stream runs. TTLConfig is
    * NONE on every slot: Spark only permits wall-clock TTL in
    * ProcessingTime mode ([[ttlUserTypeCounts]] exercises that); here
    * retention is driven by EVENT time, which is what makes the result
    * oracle-checkable.
    */
  private class InactivityReportProcessor(gapMs: Long, keep: Int)
      extends StatefulProcessor[Long, (Long, Long, Long, String), (Long, Long, Long, Long, Long)] {
    @transient private var totals: ValueState[(Long, Long)] = _
    @transient private var history: ListState[(Long, Long)] = _
    @transient private var typeCounts: MapState[String, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val enc = org.apache.spark.sql.Encoders
      totals = getHandle.getValueState[(Long, Long)]("totals",
        enc.product[(Long, Long)], TTLConfig.NONE)
      history = getHandle.getListState[(Long, Long)]("history",
        enc.product[(Long, Long)], TTLConfig.NONE)
      typeCounts = getHandle.getMapState[String, Long]("typeCounts",
        enc.STRING, enc.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(key: Long,
        rows: Iterator[(Long, Long, Long, String)],
        timerValues: TimerValues): Iterator[(Long, Long, Long, Long, Long)] = {
      // watermark-advance sentinel rows: no state, no timer, no output
      if (key < 0) return Iterator.empty
      val (pn, pLast) = if (totals.exists()) totals.get() else (0L, Long.MinValue)
      var n = pn
      var last = pLast
      val hist = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      if (history.exists()) history.get().foreach(hist += _)
      rows.foreach { case (_, us, eid, et) =>
        n += 1
        if (us > last) last = us
        hist += ((us, eid))
        val c = if (typeCounts.containsKey(et)) typeCounts.getValue(et) else 0L
        typeCounts.updateValue(et, c + 1)
      }
      val top = hist.sortBy { case (us, eid) => (-us, -eid) }.take(keep)
      history.put(top.toArray)
      totals.update((n, last))
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(last / 1000L + gapMs)
      Iterator.empty
    }
    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expired: ExpiredTimerInfo): Iterator[(Long, Long, Long, Long, Long)] = {
      val out =
        if (totals.exists()) {
          val n = totals.get()._1
          val nTypes = typeCounts.keys().size.toLong
          history.get().toList.sortBy { case (us, eid) => (-us, -eid) }
            .zipWithIndex
            .map { case ((_, eid), i) => (key, (i + 1).toLong, eid, n, nTypes) }
        } else Nil
      totals.clear()
      history.clear()
      typeCounts.clear()
      out.iterator
    }
  }

  /** Per-(user, event_type) running counts with a WALL-CLOCK TTL on the
    * MapState (st14) — ProcessingTime mode, the only mode Spark permits
    * TTLConfig in. The declared query runs with a 1-hour TTL: far
    * longer than any drain, so the result is deterministic and
    * oracle-gated while the whole TTL machinery (per-slot TTL index,
    * cleanup on every batch commit) runs live in the RocksDB store.
    * Actual expiry semantics — state REALLY disappearing after the TTL
    * and counts restarting from zero — are pinned by StreamingSpec
    * with a short TTL and a real clock wait, which a cross-engine
    * oracle cannot express (DuckDB has no wall clock). Emits the
    * touched (user, type, newCount) entries each batch; the caller
    * keeps the max count per pair (counts only grow).
    */
  def ttlUserTypeCounts(spark: SparkSession, events: DataFrame,
      ttl: java.time.Duration = java.time.Duration.ofHours(1)): DataFrame = {
    import spark.implicits._
    events.select(col("user_id"), col("event_type")).as[(Long, String)]
      .groupByKey(_._1)
      .transformWithState(new TtlTypeCountsProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Update())
      .toDF("user_id", "event_type", "n")
  }

  private class TtlTypeCountsProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[Long, (Long, String), (Long, String, Long)] {
    @transient private var typeCounts: MapState[String, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      typeCounts = getHandle.getMapState[String, Long]("typeCounts",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig(ttl))
    override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
        timerValues: TimerValues): Iterator[(Long, String, Long)] = {
      // fold the batch locally first so each map key is read from (and
      // written to) state once per batch, not once per row
      val touched = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      rows.foreach { case (_, et) =>
        val base = touched.getOrElse(et,
          if (typeCounts.containsKey(et)) typeCounts.getValue(et) else 0L)
        touched.update(et, base + 1)
      }
      touched.foreach { case (et, c) => typeCounts.updateValue(et, c) }
      touched.iterator.map { case (et, c) => (key, et, c) }
    }
  }

  /** Streaming KMV distinct-count sketch — bounded-state cardinality
    * over an unbounded stream. State per group is the ≤ K smallest
    * distinct 60-bit key hashes (the portable md5-prefix hash of
    * [[graft.queries.Sketches]], computed identically here in executor
    * code), merged batch-by-batch with NoTimeout — cardinality state
    * never expires, it saturates at K longs per group. Two properties
    * carry the whole design: the k-min set is a commutative monoid
    * (batch arrival order cannot change the final state — the
    * mergeability SketchSpec proves for the batch twin), and it is
    * DUPLICATE-INSENSITIVE, so source redelivery needs no separate
    * dedup state: re-seen keys hash into values already kept or
    * already above the cut. Emits (grp, updates, n_kept, hk) each
    * batch; the caller keeps the highest-updates row per group and
    * applies the same estimate expression as the batch operator.
    */
  def kmvDistinct(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val K = graft.queries.Sketches.K
    def h60(key: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(key.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16)
    }
    val typed = events.select(col("event_type"), col("user_id"))
      .as[(String, Long)]
    typed.groupByKey(_._1)
      .mapGroupsWithState[(Long, Array[Long]), (String, Long, Long, Long)](
        GroupStateTimeout.NoTimeout) {
        case (grp, rows, state) =>
          val (updates, kept) = state.getOption.getOrElse((0L, Array.empty[Long]))
          val merged = (kept ++ rows.map(r => h60(r._2.toString)))
            .distinct.sorted.take(K)
          state.update((updates + 1, merged))
          (grp, updates + 1, merged.length.toLong, merged.last)
      }
      .toDF("grp", "updates", "n_kept", "hk")
  }

  /** Streaming heavy-hitter CANDIDATES per event type — bounded
    * Misra-Gries state in mapGroupsWithState (the streaming member of
    * the a20 family): each batch folds its items into a ≤[[HhK]]-entry
    * counter map; survivors are emitted as the candidate list. The
    * summary itself is arrival-order-dependent and duplicate-SENSITIVE
    * (unlike KMV), but the frequent-items guarantee survives both:
    * an item absent from the final state has (possibly redelivered)
    * stream frequency ≤ n/(k+1), and uniform redelivery scales both
    * sides of that bound — so the candidate list stays a PROVEN
    * superset of the true heavy hitters and the consumer's exact
    * verification pass (st10) yields an answer independent of
    * ordering, partitioning, and redelivery. State per key is k
    * counters at any stream length.
    */
  def heavyHitterCandidates(spark: SparkSession, events: DataFrame)
      : DataFrame = {
    import spark.implicits._
    val k = HhK
    val typed = events.select(col("event_type"), col("item"))
      .as[(String, Long)]
    typed.groupByKey(_._1)
      .mapGroupsWithState[(Long, Map[Long, Long]), (String, Long, Seq[Long])](
        GroupStateTimeout.NoTimeout) {
        case (grp, rows, state) =>
          val (updates, prev) = state.getOption.getOrElse((0L, Map.empty[Long, Long]))
          val next = graft.queries.Sketches.misraGriesFold(
            prev, rows.map(_._2), k)
          state.update((updates + 1, next))
          (grp, updates + 1, next.keys.toSeq.sorted)
      }
      .toDF("grp", "updates", "candidates")
  }

  val HhK = 128 // MG capacity: 2x the 1/64 verification bar

  /** Streaming duplicate suppression — the streaming twin of the batch
    * dedup family (north-star) and of the reference's "skip what was
    * already ingested" semantics: redeliveries of an event inside the
    * watermark horizon are dropped exactly once, and the per-key state
    * is EVICTED once the watermark passes — bounded state, unlike a
    * global streaming distinct, which is what makes this shape viable
    * on an unbounded 100 TB/day stream.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Drain everything currently available into an in-memory table and
    * stop — the cron-tick batch semantics (I1). Returns the table name.
    */
  def drainToMemory(
      df: DataFrame,
      name: String,
      checkpoint: String,
      mode: OutputMode = OutputMode.Complete()): String = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    name
  }

  /** Drain everything currently available into an in-memory table by
    * running the query until the source is exhausted, then STOPPING it
    * — for operators whose physical plan asks for endless follow-up
    * batches (TransformWithStateExec in ProcessingTime mode reports
    * shouldRunAnotherBatch = true unconditionally, so
    * Trigger.AvailableNow never terminates, and the forced keep-alive
    * batches count as batches, so `processAllAvailable`'s noNewData
    * latch never trips either — both verified empirically). The drain
    * condition is sink-side instead: the input files are all staged
    * BEFORE the query starts, so once three consecutive committed
    * batches report zero input rows the backlog is fully consumed and
    * the query can stop. A query-side exception is rethrown rather
    * than spun on, and a 5-minute deadline turns any future
    * never-drains regression into a loud failure instead of a hang.
    */
  def drainToMemoryAndStop(
      df: DataFrame,
      name: String,
      checkpoint: String,
      mode: OutputMode): String = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try runUntilInputDrained(q, name)
    finally q.stop()
    name
  }

  /** The drain companion of [[drainToMemoryAndStop]] for scenarios that
    * need checkpoint RECOVERY (the memory sink refuses to resume from a
    * checkpoint): each micro-batch appends to a parquet dir via
    * foreachBatch, which is recoverable, so a stop + restart with the
    * same checkpoint continues exactly where it left off — the restart
    * seam the TTL-expiry and evicted-keys-never-re-emit laws exercise.
    */
  def drainAppendParquetAndStop(df: DataFrame, outDir: String,
      checkpoint: String, mode: OutputMode): Unit = {
    val q = df.writeStream
      .outputMode(mode)
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!b.isEmpty) b.write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try runUntilInputDrained(q, outDir)
    finally q.stop()
  }

  private def runUntilInputDrained(
      q: org.apache.spark.sql.streaming.StreamingQuery, name: String): Unit = {
    val deadline = System.nanoTime() + 300L * 1000000000L
    var idleBatches = 0
    var lastBatchId = -1L
    while (idleBatches < 3) {
      if (q.exception.isDefined) throw q.exception.get
      if (System.nanoTime() > deadline)
        throw new IllegalStateException(
          s"streaming query $name did not drain within 5 minutes")
      Thread.sleep(50)
      val p = q.lastProgress
      if (p != null && p.batchId != lastBatchId) {
        lastBatchId = p.batchId
        if (p.numInputRows == 0) idleBatches += 1 else idleBatches = 0
      }
    }
  }

  /** Drain to a durable parquet sink — unlike the memory sink this
    * supports checkpoint RECOVERY, so repeated drains with the same
    * checkpoint process each input file exactly once (I1/I2: the sink
    * accumulates, the checkpoint file-log is the used_input_files state).
    */
  def drainToParquet(df: DataFrame, outDir: String, checkpoint: String): Unit = {
    val q = df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming upsert — the I3 pattern (append-only fact with
    * dedup-on-ingest, datamart.py:59-80) on a stream: each micro-batch is
    * anti-joined against the current sink state inside foreachBatch, so
    * redelivered rows never duplicate. Combined with the file-source
    * checkpoint this gives end-to-end exactly-once into a plain parquet
    * fact table, even when the SOURCE redelivers (e.g. a file re-arrives
    * under a new name).
    */
  def drainUpsert(
      df: DataFrame,
      keys: Seq[String],
      outDir: String,
      checkpoint: String): Unit = {
    val q = df.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val sinkDir = new java.io.File(outDir)
        val hasData = sinkDir.exists && Option(sinkDir.listFiles).toSeq.flatten
          .exists(_.getName.endsWith(".parquet"))
        val fresh =
          if (hasData) {
            val existing = spark.read.parquet(outDir).select(keys.map(col): _*)
            batch.join(existing, keys, "left_anti")
          } else batch
        if (!fresh.isEmpty)
          fresh.write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}

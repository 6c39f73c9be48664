package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
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
object EventsStream {

  /** events.parquet schema as stored (ts = TIMESTAMP(NANOS), which Spark
    * reads as long under the legacy conf — see graft.Tables.events).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming scan of a directory of event parquet files — the file
    * source tracks processed files in the checkpoint (I1).
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "*.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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

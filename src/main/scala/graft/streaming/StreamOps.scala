package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming operators for the ingestion side of the pipeline.
  *
  * The reference engine is batch-only (SURVEY §1.1); these cover the
  * training-data-pipeline streaming surface: watermarked windowed
  * aggregation and custom sessionization state, both over the `events`
  * schema (event_id, ts, user_id, event_type, value, props).
  */
object StreamOps {

  /** Watermarked tumbling-window counts per event type. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  final case class SessionIn(user_id: Long, ts: Timestamp, value: Double)
  final case class Session(user_id: Long, start: Timestamp, end: Timestamp,
                           events: Long, totalValue: Double)
  private final case class SessionState(start: Long, last: Long, n: Long, total: Double)

  /** Gap-based sessionization with mapGroupsWithState: a session closes
    * after `gapMinutes` of inactivity (processing-time timeout).
    */
  def sessionize(events: Dataset[SessionIn], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, Session](
        GroupStateTimeout.ProcessingTimeTimeout) {
        (userId: Long, rows: Iterator[SessionIn], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total)
          } else {
            val sorted = rows.toVector.sortBy(_.ts.getTime)
            val prev = state.getOption.getOrElse(
              SessionState(sorted.head.ts.getTime, sorted.head.ts.getTime, 0, 0))
            val next = sorted.foldLeft(prev) { (acc, e) =>
              SessionState(acc.start, math.max(acc.last, e.ts.getTime),
                acc.n + 1, acc.total + e.value)
            }
            state.update(next)
            state.setTimeoutDuration(s"$gapMinutes minutes")
            Session(userId, new Timestamp(next.start), new Timestamp(next.last),
              next.n, next.total)
          }
      }
  }

  /** End-to-end streaming smoke pipeline used by tests: read the events
    * parquet as a bounded stream (one file per trigger), window-aggregate,
    * write to an in-memory sink, return collected results.
    */
  def runBoundedWindowCount(spark: SparkSession, eventsDir: String): DataFrame = {
    val schema = spark.read.parquet(eventsDir).schema
    // the file-stream source consumes a directory; the testdata table is a
    // single parquet file, so stage it under a temp stream dir
    val src = java.nio.file.Paths.get(eventsDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(src, dir.resolve("part-0.parquet"))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .withColumn("ts", col("ts").cast("timestamp")) // NTZ -> event-time type
    val agg = windowedCounts(stream)
    val q = agg.writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Complete()).start()
    q.processAllAvailable()
    q.stop()
    spark.table("win_counts")
  }
}

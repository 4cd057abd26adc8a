package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._
import graft.Tables

/** Structured Streaming over the events table: the same windowed
  * aggregation expressed as a stream (readStream → watermark → window)
  * and as its batch twin (what the driver verifies against DuckDB).
  *
  * At scale the stream source is Kafka/files and state is backed by
  * RocksDB; the plan shape (watermark bounds state, window agg is a
  * streaming partial agg) is identical.
  */
object EventStreams {

  /** The parquet carries TIMESTAMP(NANOS) which Spark reads as a nanos
    * long (see Tables.events); the stream source declares it as long
    * and converts to a µs timestamp first thing.
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** 15-minute tumbling-window counts per event type — streaming form. */
  def windowAggStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("value") * 100 + lit(0.5)).cast("long")) / lit(100.0)).as("sum_value"))

  /** Runs the stream to completion against the static dir via the
    * memory sink (the local test harness path; processAllAvailable
    * drives all batches synchronously).
    */
  def runToMemory(spark: SparkSession, dir: String, name: String): StreamingQuery = {
    val q = windowAggStream(spark, dir)
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .start()
    q.processAllAvailable()
    q
  }

  /** s_window_agg: batch twin of windowAggStream — identical window
    * semantics (epoch-aligned tumbling windows), oracle-checkable.
    */
  def sWindowAggBatch(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("value") * 100 + lit(0.5)).cast("long")) / lit(100.0)).as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("win_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("win_start", "event_type")
}

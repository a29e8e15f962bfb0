package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.core.EngineConfig
import graft.route.RouteRegistry
import graft.streaming.KafkaBridge

/** Unified envelope sources for the router (SURVEY.md §2.2 "Scans/sources").
  *
  * The reference consumes Kafka only; a Spark-native engine gets every
  * DataSource for free. This module normalizes them all to the router's
  * `(topic: string, value: string)` envelope shape so the same route plan
  * runs over Kafka, files (batch or streamed directory), or literal rows:
  *
  *  - `kafka`   — the production source ([[KafkaBridge.source]]).
  *  - `json`/`csv`/`parquet`/`text` files — batch backfills and replays of
  *    archived event dumps; the streaming variant tails a directory, which
  *    is also the standard bridge for testing without a broker.
  *
  * At scale, file replays read splittable formats with pushdown; the
  * `topic` can be a constant, a column, or derived from the path
  * (`input_file_name`).
  */
object EventSource {

  /** Batch file scan → envelope rows. `valueCol` must serialize one event
    * JSON per row (for `text` format the whole line is the value). */
  def batchFiles(
      spark: SparkSession,
      format: String,
      path: String,
      topic: String,
      valueCol: Option[String] = None,
      schema: Option[StructType] = None): DataFrame = {
    val reader = spark.read.format(format)
    schema.foreach(reader.schema)
    val df = reader.load(path)
    toEnvelopes(df, topic, valueCol)
  }

  /** Streaming directory tail → envelope rows (requires a schema for
    * file formats, per Structured Streaming rules). */
  def streamFiles(
      spark: SparkSession,
      format: String,
      path: String,
      topic: String,
      schema: StructType,
      valueCol: Option[String] = None): DataFrame = {
    val df = spark.readStream.format(format).schema(schema).load(path)
    toEnvelopes(df, topic, valueCol)
  }

  /** Kafka envelope source for a configured router. */
  def kafka(spark: SparkSession, config: EngineConfig, router: RouteRegistry): DataFrame =
    KafkaBridge.source(spark, config, router)

  /** Normalize any DataFrame to `(topic, value)`: use `valueCol` if given
    * (e.g. the `value` of a raw dump or the `props` of the harness events
    * table), otherwise JSON-serialize the full row. */
  def toEnvelopes(df: DataFrame, topic: String, valueCol: Option[String]): DataFrame =
    valueCol match {
      case Some(c) => df.select(lit(topic).as("topic"), col(c).cast("string").as("value"))
      case None => df.select(lit(topic).as("topic"), to_json(struct(df.columns.map(col): _*)).as("value"))
    }
}

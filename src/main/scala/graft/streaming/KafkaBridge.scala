package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{EngineConfig, Strategy}
import graft.route.RouteRegistry

/** Kafka source/sink wiring (reference O1, O2, O12, O18 — SURVEY.md §2.1).
  *
  * The reference subscribes one kafkajs consumer to the deduped topic set
  * and hand-rolls pause/resume backpressure; on Spark both are declarative:
  *  - source pruning = `subscribe` only the routed topics;
  *  - admission control = `maxOffsetsPerTrigger` (+ micro-batch barrier);
  *  - `minPartitions` splits hot topic-partitions across executors — at
  *    100 TB/day the consumer parallelism is `max(kafka partitions,
  *    minPartitions)`, not one event loop.
  *
  * Producer tuning passthrough (O18): compression, idempotence, retries map
  * 1:1 onto `kafka.*` options; connection pooling + TTL (O17) is the
  * connector's producer cache.
  *
  * Untestable in this environment (no broker, no kafka connector jar) —
  * exercised through the memory source/sink twins in the testkit, which is
  * exactly the reference's own `onlyTesting` philosophy.
  */
object KafkaBridge {

  /** Streaming envelope source for a router: subscribes the deduped routed
    * topic set, yields `(topic, value)` rows. */
  def source(
      spark: SparkSession,
      config: EngineConfig,
      router: RouteRegistry,
      minPartitions: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", config.host)
      .option("subscribe", router.topics.mkString(","))
      .option("startingOffsets", "latest")
      .option("failOnDataLoss", "false")
      .option("maxOffsetsPerTrigger", maxOffsets(config, router).toString)
    config.groupId.foreach(g => reader.option("kafka.group.id", g))
    minPartitions.foreach(p => reader.option("minPartitions", p.toString))
    reader.load()
      .select(col("topic"), col("value").cast("string").as("value"))
  }

  /** Micro-batch admission bound: the Spark analog of the reference's
    * per-topic in-flight caps (consumer/legacy-consumer.ts:175-181).
    * `OneByOne` → 1 message per micro-batch (strict serialization);
    * `Topic` → cap × topic-count (per-topic caps with distinct limits would
    * use one query per topic, each with its own bound). Topics marked
    * unlimited (None in perTopicCaps) don't constrain the bound. */
  def maxOffsets(config: EngineConfig, router: RouteRegistry): Long =
    config.strategy match {
      case Strategy.OneByOne => 1L
      case Strategy.Topic =>
        router.topics.map { t =>
          config.perTopicCaps.getOrElse(t, Some(config.maxMessagesPerTopic))
            .getOrElse(Int.MaxValue).toLong
        }.sum
    }

  /** Batch Kafka sink with producer tuning passthrough (O18). */
  def sink(df: DataFrame, config: EngineConfig, host: String): Unit = {
    val w = df.write.format("kafka")
      .option("kafka.bootstrap.servers", host)
    config.compression.foreach(c => w.option("kafka.compression.type", c))
    if (config.idempotent) w.option("kafka.enable.idempotence", "true")
    w.save()
  }
}

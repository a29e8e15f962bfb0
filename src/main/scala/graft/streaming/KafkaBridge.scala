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
  * Producer tuning passthrough (O18): compression, idempotence, retries and
  * partitioner choice (legacy-producer.ts:100,106) map 1:1 onto `kafka.*`
  * options; connection pooling + TTL (O17) is the connector's producer
  * cache.
  *
  * Untestable in this environment (no broker, no kafka connector jar) —
  * exercised through the memory source/sink twins in the testkit, which is
  * exactly the reference's own `onlyTesting` philosophy.
  */
object KafkaBridge {

  /** The exact option map [[source]] hands the kafka reader — pure, so
    * the wiring is contract-testable without a broker (the only part of
    * O1 reachable in this environment; the connector consumes these keys
    * verbatim). */
  def sourceOptions(
      config: EngineConfig,
      router: RouteRegistry,
      minPartitions: Option[Int] = None): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> config.host,
      "subscribe" -> router.topics.mkString(","),
      "startingOffsets" -> config.startingOffsets,
      "failOnDataLoss" -> config.resolveFailOnDataLoss.toString,
      "maxOffsetsPerTrigger" -> maxOffsets(config, router).toString) ++
      config.groupId.map("kafka.group.id" -> _) ++
      minPartitions.map("minPartitions" -> _.toString)

  /** Streaming envelope source for a router: subscribes the deduped routed
    * topic set, yields `(topic, value)` rows. */
  def source(
      spark: SparkSession,
      config: EngineConfig,
      router: RouteRegistry,
      minPartitions: Option[Int] = None): DataFrame =
    spark.readStream.format("kafka")
      .options(sourceOptions(config, router, minPartitions))
      .load()
      .select(col("topic"), col("value").cast("string").as("value"))

  /** How much an "unlimited" topic contributes to the shared micro-batch
    * bound: large relative to any cap, but finite — one unlimited topic
    * must not erase every other topic's admission control (the bound is a
    * single global knob; true per-topic isolation = [[perTopicPlans]]). */
  val UnlimitedShareFactor = 100L

  /** Micro-batch admission bound: the Spark analog of the reference's
    * per-topic in-flight caps (consumer/legacy-consumer.ts:175-181).
    * `OneByOne` → 1 message per micro-batch (strict serialization);
    * `Topic` → sum of per-topic caps, with unlimited topics clamped to
    * `UnlimitedShareFactor × maxMessagesPerTopic`. The global bound is
    * approximate by nature — Kafka admission can't be split per topic
    * within one query; use [[perTopicPlans]] when exact per-topic caps
    * matter. */
  def maxOffsets(config: EngineConfig, router: RouteRegistry): Long =
    config.strategy match {
      case Strategy.OneByOne => 1L
      case Strategy.Topic =>
        val unlimitedShare = UnlimitedShareFactor * config.maxMessagesPerTopic
        router.topics.map { t =>
          config.perTopicCaps.getOrElse(t, Some(config.maxMessagesPerTopic))
            .map(_.toLong).getOrElse(unlimitedShare)
        }.sum
    }

  /** Exact per-topic admission: one streaming query per topic, each with
    * its own `maxOffsetsPerTrigger` (None = no bound). This is the faithful
    * translation of the reference's independent per-topic queues — at the
    * cost of one consumer group/query per topic. */
  def perTopicPlans(config: EngineConfig, router: RouteRegistry): Map[String, Option[Long]] =
    router.topics.map { t =>
      t -> (config.strategy match {
        case Strategy.OneByOne => Some(1L)
        case Strategy.Topic =>
          config.perTopicCaps.getOrElse(t, Some(config.maxMessagesPerTopic)).map(_.toLong)
      })
    }.toMap

  /** The exact option map [[sink]] hands the kafka writer — pure twin of
    * [[sourceOptions]] for O2/O18. */
  def sinkOptions(config: EngineConfig, host: String): Map[String, String] =
    Map("kafka.bootstrap.servers" -> host) ++
      config.compression.map("kafka.compression.type" -> _) ++
      (if (config.idempotent) Some("kafka.enable.idempotence" -> "true") else None) ++
      config.retries.map(r => "kafka.retries" -> r.toString) ++
      config.partitionerClass.map("kafka.partitioner.class" -> _)

  /** Batch Kafka sink with producer tuning passthrough (O18). */
  def sink(df: DataFrame, config: EngineConfig, host: String): Unit =
    df.write.format("kafka").options(sinkOptions(config, host)).save()
}

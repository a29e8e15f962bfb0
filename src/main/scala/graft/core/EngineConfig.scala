package graft.core

/** Consumer admission-control strategy.
  *
  * Mirrors the reference's two modes (/root/reference/src/consumer/
  * legacy-consumer.ts:161-201, interfaces/index.ts:14):
  *  - [[Strategy.Topic]]   — bounded in-flight work per topic. In Spark this
  *    is engine-managed: `maxOffsetsPerTrigger` bounds each micro-batch and
  *    the micro-batch barrier guarantees batch N+1 is not fetched until N
  *    completes; no pause/resume calls are needed.
  *  - [[Strategy.OneByOne]] — strict serial processing. Parity mode only:
  *    at 100 TB this is by definition non-scalable (the reference only
  *    achieves it because Node is single-threaded).
  */
sealed trait Strategy
object Strategy {
  case object Topic extends Strategy
  case object OneByOne extends Strategy
}

/** Handler-failure policy (SURVEY.md §7.4.5). The reference swallows handler
  * errors and commits offsets anyway (consumer/legacy-consumer.ts:100-106) —
  * that is [[ErrorPolicy.LogAndContinue]], the default for parity. Spark's
  * native mode is [[ErrorPolicy.FailFast]]: the micro-batch fails and is
  * retried from the checkpoint (at-least-once).
  */
sealed trait ErrorPolicy
object ErrorPolicy {
  case object LogAndContinue extends ErrorPolicy
  case object FailFast extends ErrorPolicy
}

/** Engine configuration — the typed analog of the reference's config
  * singleton (/root/reference/src/config/index.ts:4-18, defaults at
  * constants/index.ts:15-24). Immutable case class instead of mutable
  * module state; pass it where you need it.
  *
  * @param host               primary Kafka bootstrap servers
  * @param additionalHosts    replicated-sink clusters (every emit goes to
  *                           host + additionalHosts — reference O3)
  * @param appName            producer identity for envelope enrichment
  * @param groupId            consumer group id (required to consume)
  * @param maxMessagesPerTopic per-topic in-flight cap for Strategy.Topic
  *                           (reference default 20); maps to
  *                           `maxOffsetsPerTrigger`
  * @param perTopicCaps       per-topic overrides; `None` value = unlimited
  * @param compression        Kafka producer compression ("gzip" | none)
  * @param idempotent         Kafka producer idempotence
  * @param retries            producer send retries (reference
  *                           `producer.retryOptions`, legacy-producer.ts:100;
  *                           kafkajs RetryOptions.retries). `None` keeps the
  *                           Kafka client default — same as the reference,
  *                           whose undefined retryOptions defers to kafkajs.
  * @param partitionerClass   fully-qualified producer partitioner class
  *                           (reference `producer.partitioners`,
  *                           legacy-producer.ts:106, default
  *                           LegacyPartitioner at constants/index.ts:23).
  *                           kafkajs partitioners are JS functions with no
  *                           JVM equivalent, so the Spark analog is the Java
  *                           client's `partitioner.class`; `None` keeps the
  *                           client default.
  * @param onlyTesting        capture emitted events in memory instead of
  *                           producing (reference O15)
  * @param parsedEventsReverseCompat replicate the reference's per-batch
  *                           `.reverse()` in getParsedEmittedEvents
  *                           (producer/legacy-producer.ts:77 — looks like a
  *                           bug; off by default)
  * @param checkpointLocation Structured Streaming checkpoint dir (replaces
  *                           the reference's Kafka offset auto-commit with a
  *                           WAL — upgrades delivery to at-least-once even
  *                           across restarts)
  * @param dlqTopic           dead-letter topic for malformed messages. The
  *                           reference silently skips them (README.md:103);
  *                           with a DLQ set they are additionally emitted
  *                           raw for inspection/replay — an extension, off
  *                           by default for parity.
  * @param startingOffsets    Kafka source start position ("latest" |
  *                           "earliest" | per-partition JSON). Only applies
  *                           to the first start; once a checkpoint exists
  *                           the WAL wins. Default "latest" = the
  *                           reference's `fromBeginning: false` consumer.
  * @param failOnDataLoss     fail the stream when expected offsets are gone
  *                           (topic deleted / retention passed). `None`
  *                           (default) resolves to TRUE when
  *                           `checkpointLocation` is set — silently skipping
  *                           a data-loss window would break the
  *                           at-least-once contract the checkpoint
  *                           advertises — and FALSE for ephemeral
  *                           checkpoint-less runs.
  */
final case class EngineConfig(
    host: String = "localhost:9092",
    additionalHosts: Seq[String] = Nil,
    appName: Option[String] = None,
    groupId: Option[String] = None,
    strategy: Strategy = Strategy.Topic,
    maxMessagesPerTopic: Int = 20,
    perTopicCaps: Map[String, Option[Int]] = Map.empty,
    compression: Option[String] = None,
    idempotent: Boolean = false,
    retries: Option[Int] = None,
    partitionerClass: Option[String] = None,
    onlyTesting: Boolean = false,
    errorPolicy: ErrorPolicy = ErrorPolicy.LogAndContinue,
    parsedEventsReverseCompat: Boolean = false,
    checkpointLocation: Option[String] = None,
    dlqTopic: Option[String] = None,
    startingOffsets: String = "latest",
    failOnDataLoss: Option[Boolean] = None) {

  /** Resolved failOnDataLoss — see the param doc. */
  def resolveFailOnDataLoss: Boolean =
    failOnDataLoss.getOrElse(checkpointLocation.isDefined)

  /** appName resolution chain (reference producer/legacy-producer.ts:152 +
    * README.md:112-118): per-message appName → config.appName → groupId →
    * parsed $HOSTNAME → "unknown". */
  def resolveAppName(
      messageAppName: Option[String] = None,
      hostnameEnv: Option[String] = sys.env.get("HOSTNAME")): String =
    messageAppName
      .orElse(appName)
      .orElse(groupId)
      .orElse(hostnameEnv.filter(_.nonEmpty).map(EngineConfig.parseHostname))
      .getOrElse("unknown")
}

object EngineConfig {
  /** K8s pod-name trim (reference producer/legacy-producer.ts:50-55): drop
    * the last two dash-segments iff the name has more than two segments
    * (`my-service-name-abcd-1234` → `my-service-name`). */
  def parseHostname(hostname: String): String = {
    val parts = hostname.split("-")
    if (parts.length > 2) parts.dropRight(2).mkString("-") else hostname
  }
}

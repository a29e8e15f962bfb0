package graft.produce

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{EngineConfig, Envelope}
import graft.functions.ToUpperCamelCase
import org.apache.spark.unsafe.types.UTF8String

/** One emitted batch: every message of one `emit` call for one topic —
  * the analog of the reference's `Payload {topic, messages:[{value}]}`
  * (producer/legacy-producer.ts:23-28). */
final case class EmittedBatch(topic: String, values: Seq[String])

/** The produce path (reference operators O2–O5, O15, O22 — SURVEY.md §2.1).
  *
  * Responsibilities, each mapped Spark-first:
  *  - **Envelope enrichment** (O4): a pure `Column` projection — payload
  *    fields first, then `createdAt`, `appName`, `code` in exactly the
  *    reference's serialized field order (its tests assert the JSON
  *    byte-exact, producer/__tests__/index.test.ts:58-71).
  *  - **Fan-out** (O5): `data: array<struct>` → `explode`, one message per
  *    element.
  *  - **Validation** (O22): analysis-time failures before any job runs —
  *    reserved `code` column, blank eventName.
  *  - **Kafka sink** (O2) + **multi-cluster replication** (O3): one write
  *    per host over a persisted batch. At scale the batch is computed once
  *    (`persist`) and the Kafka connector pools producers per executor —
  *    the reference's hand-rolled connection pool + TTL (O17) is
  *    engine-managed (`spark.kafka.producer.cache.timeout`).
  *  - **In-memory test sink** (O15): `onlyTesting` captures enriched JSON
  *    driver-side for assertions; `getParsedEmittedEvents` can replicate
  *    the reference's per-batch `.reverse()` quirk behind
  *    `parsedEventsReverseCompat`.
  *
  * The clock is injectable (the reference's tests freeze time with
  * MockDate; ours pass a fixed `() => Instant`).
  */
final class Emitter(
    val config: EngineConfig,
    clock: () => Instant = Emitter.WallClock) {

  import Emitter._

  private val captured = mutable.ArrayBuffer.empty[EmittedBatch]

  // ---------------------------------------------------------------- enrich

  /** Envelope-enrich a payload DataFrame for `topic`. Pure projection —
    * stays inside whole-stage codegen; `ToUpperCamelCase` is applied
    * driver-side because `code` derives from the emit call's
    * eventName/topic, not from data (producer/legacy-producer.ts:44). */
  def enrich(df: DataFrame, topic: String, eventName: Option[String] = None): DataFrame = {
    validate(df, topic, eventName)
    val code = upperCamel(eventName.getOrElse(topic))
    // With the default wall clock the stamp is a current_timestamp()
    // EXPRESSION, re-evaluated per batch query / per micro-batch — a
    // literal would freeze stream-start time into a long-running
    // writeStream plan. An injected clock (tests) becomes a literal.
    // Rendering goes through to_utc_timestamp so the string is UTC wall
    // time in ANY session timezone (the reference's toISOString semantics).
    val nowStamp: Column =
      if (clock eq Emitter.WallClock)
        date_format(
          to_utc_timestamp(current_timestamp(), current_timezone()),
          Envelope.CreatedAtPattern)
      else lit(formatCreatedAt(clock()))
    val createdAt: Column =
      if (df.columns.contains(Envelope.CreatedAtField))
        coalesce(col(Envelope.CreatedAtField), nowStamp)
      else nowStamp
    val appName: Column =
      if (df.columns.contains(Envelope.AppNameField))
        coalesce(col(Envelope.AppNameField), lit(config.resolveAppName()))
      else lit(config.resolveAppName())
    // Field order parity with `{...payload, createdAt: ..., appName, code}`:
    // JS object spread keeps a re-assigned key at its ORIGINAL position, so
    // payload-supplied createdAt/appName stay in place; only meta fields the
    // payload lacks are appended (createdAt, appName), and `code` (reserved,
    // never in payloads) is always last.
    val inPlace = df.columns.map {
      case Envelope.CreatedAtField => createdAt.as(Envelope.CreatedAtField)
      case Envelope.AppNameField => appName.as(Envelope.AppNameField)
      case c => col(c)
    }
    val appended =
      (if (df.columns.contains(Envelope.CreatedAtField)) Nil
       else Seq(createdAt.as(Envelope.CreatedAtField))) ++
        (if (df.columns.contains(Envelope.AppNameField)) Nil
         else Seq(appName.as(Envelope.AppNameField))) :+
        lit(code).as(Envelope.CodeField)
    df.select(
      lit(topic).as("topic"),
      to_json(struct(inPlace ++ appended: _*)).as("value"))
  }

  /** Fan-out (O5): one message per element of an array column. */
  def fanOut(df: DataFrame, arrayCol: String = "data"): DataFrame = {
    val others = df.columns.filterNot(_ == arrayCol).map(col)
    df.select(explode(col(arrayCol)).as("__el") +: others: _*)
      .select(col("__el.*") +: others: _*)
      .drop(arrayCol)
  }

  // ------------------------------------------------------------------ emit

  /** Emit a payload DataFrame to `topic` on every configured host (batch).
    * `overwriteHosts` replaces the configured host set for this call only
    * (reference emit overload p3, producer/legacy-producer.ts:194).
    *
    * A 0-row DataFrame emits nothing and records no captured batch —
    * consistent with [[emitStream]]'s per-micro-batch capture. The
    * reference instead REJECTS an empty `data` array eagerly
    * (producer/legacy-producer.ts:180 "Data array can't be empty"); that
    * validation is not reproducible here because a DataFrame's row count
    * is unknown until the job runs — documented deviation.
    *
    * Returns `Unit`, not per-record acks: the reference resolves each send
    * to `RecordMetadata[][]` (one array per host,
    * producer/legacy-producer.ts:196-209, resolved at 199-206). Spark's
    * Kafka sink acks at job granularity — `save()` returning IS the
    * all-partitions-acked signal; per-record topic/partition/offset
    * metadata never reaches the driver (and collecting it for billions of
    * rows would be an anti-pattern). Callers who branched on RecordMetadata
    * in the reference should branch on emit's success/exception instead —
    * documented deviation (SURVEY.md §7.4.8). */
  def emit(
      df: DataFrame,
      topic: String,
      eventName: Option[String] = None,
      overwriteHosts: Option[Seq[String]] = None): Unit = {
    val enriched = enrich(df, topic, eventName)
    if (config.onlyTesting) {
      val values = enriched.select("value").collect().map(_.getString(0)).toSeq
      if (values.nonEmpty) synchronized { captured += EmittedBatch(topic, values) }
    } else {
      val hosts = resolveHosts(overwriteHosts)
      // Multi-cluster replication (O3): compute once, write per host.
      // Exactly-once across clusters is impossible; like the reference these
      // are independent at-least-once sends (SURVEY.md §7.4.7).
      enriched.persist()
      try hosts.foreach(writeKafkaBatch(enriched, topic, _))
      finally enriched.unpersist()
    }
  }

  /** Driver-side convenience emit of literal JSON documents — the analog of
    * the reference's `emit({topic, data})` with plain objects. Object key
    * order is preserved; enrichment appends the meta fields exactly like
    * `JSON.stringify({...data, createdAt, appName, code})`. */
  def emitJson(
      topic: String,
      docs: Seq[String],
      eventName: Option[String] = None): Unit = {
    require(docs.nonEmpty, "The data attribute must not be an empty array")
    eventName.foreach(e =>
      require(e.trim.nonEmpty, "The eventName attribute cannot be an empty string"))
    val code = upperCamel(eventName.getOrElse(topic))
    val values = docs.map { doc =>
      val node = mapper.readTree(doc) match {
        case o: ObjectNode => o
        case _ => throw new IllegalArgumentException(
          "The data attribute must be an object or a non-empty array of objects")
      }
      require(!node.has(Envelope.CodeField),
        s"The payload is using a reserved property (${Envelope.CodeField})")
      if (!node.has(Envelope.CreatedAtField))
        node.put(Envelope.CreatedAtField, formatCreatedAt(clock()))
      if (!node.has(Envelope.AppNameField))
        node.put(Envelope.AppNameField, config.resolveAppName())
      node.put(Envelope.CodeField, code)
      mapper.writeValueAsString(node)
    }
    if (config.onlyTesting) synchronized { captured += EmittedBatch(topic, values) }
    else throw new IllegalStateException(
      "emitJson outside onlyTesting requires a Kafka cluster; use emit(df, ...)")
  }

  /** Streaming emit: enrich + Kafka sink for every configured host via
    * foreachBatch (replicated sinks can't be a single writeStream). In
    * `onlyTesting` mode each micro-batch is captured in memory, like the
    * batch emit path. */
  def emitStream(
      df: DataFrame,
      topic: String,
      eventName: Option[String] = None,
      checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val enriched = enrich(df, topic, eventName)
    val hosts = resolveHosts(None)
    val writer = enriched.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (config.onlyTesting) {
          val values = batch.select("value").collect().map(_.getString(0)).toSeq
          if (values.nonEmpty) synchronized { captured += EmittedBatch(topic, values) }
        } else {
          batch.persist()
          try hosts.foreach(writeKafkaBatch(batch, topic, _))
          finally batch.unpersist()
        }
        ()
      }
    checkpoint.orElse(config.checkpointLocation)
      .foreach(writer.option("checkpointLocation", _))
    writer.start()
  }

  /** Raw passthrough emit (no envelope, no validation) — dead-letter
    * routing of unparseable message values. */
  private[graft] def emitRaw(df: DataFrame, topic: String): Unit = {
    val values = df.select(col("value").cast("string").as("value"))
    if (config.onlyTesting) {
      val vs = values.collect().map(_.getString(0)).toSeq
      if (vs.nonEmpty) synchronized { captured += EmittedBatch(topic, vs) }
    } else {
      val withTopic = values.select(col("value"), lit(topic).as("topic")).persist()
      try resolveHosts(None).foreach(writeKafkaBatch(withTopic, topic, _))
      finally withTopic.unpersist()
    }
  }

  private def resolveHosts(overwrite: Option[Seq[String]]): Seq[String] =
    overwrite.filter(_.nonEmpty).getOrElse(config.host +: config.additionalHosts)

  private def writeKafkaBatch(enriched: DataFrame, topic: String, host: String): Unit =
    enriched.selectExpr("CAST(value AS STRING) AS value", "topic")
      .write.format("kafka")
      // single source of truth for the O18 producer passthrough (compression,
      // idempotence, retries, partitioner class) — contract-tested there
      .options(graft.streaming.KafkaBridge.sinkOptions(config, host))
      .save()

  private def validate(df: DataFrame, topic: String, eventName: Option[String]): Unit = {
    require(topic.trim.nonEmpty, "The topic attribute cannot be an empty string")
    eventName.foreach(e =>
      require(e.trim.nonEmpty, "The eventName attribute cannot be an empty string"))
    require(!df.columns.contains(Envelope.CodeField),
      s"The payload is using a reserved property (${Envelope.CodeField})")
  }

  // ------------------------------------------------------- test accessors

  /** Raw captured batches (reference `getEmittedEvents`). */
  def getEmittedEvents: Seq[EmittedBatch] = synchronized(captured.toSeq)

  /** Parsed captured events as (topic, fieldMap). With
    * `parsedEventsReverseCompat` each batch's messages are reversed, exactly
    * replicating producer/legacy-producer.ts:77 (which looks like a bug —
    * deviation documented, default off). */
  def getParsedEmittedEvents: Seq[(String, Map[String, Any])] = synchronized {
    captured.toSeq.flatMap { b =>
      val vs = if (config.parsedEventsReverseCompat) b.values.reverse else b.values
      vs.map(v => b.topic -> jsonToMap(v))
    }
  }

  def clearEmittedEvents(): Unit = synchronized(captured.clear())
}

object Emitter {
  /** Sentinel default clock: identity-compared in [[Emitter.enrich]] to
    * decide between a per-batch `current_timestamp()` expression (wall
    * clock) and a frozen literal (injected test clock). */
  val WallClock: () => Instant = () => Instant.now()

  private val mapper = new ObjectMapper()

  private val createdAtFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss'Z'").withZone(ZoneOffset.UTC)

  /** Second-precision, space-separated, UTC — the reference's non-standard
    * ISO variant (producer/legacy-producer.ts:42). */
  def formatCreatedAt(i: Instant): String = createdAtFmt.format(i)

  /** Driver-side twin of the [[graft.functions.ToUpperCamelCase]] expression. */
  def upperCamel(s: String): String =
    ToUpperCamelCase.transform(UTF8String.fromString(s)).toString

  private def jsonToMap(json: String): Map[String, Any] = {
    def conv(n: com.fasterxml.jackson.databind.JsonNode): Any = n match {
      case o: ObjectNode =>
        o.properties().asScala.map(e => e.getKey -> conv(e.getValue)).toMap
      case a if a.isArray => a.asScala.map(conv).toSeq
      case v if v.isTextual => v.asText()
      case v if v.isIntegralNumber => v.asLong()
      case v if v.isNumber => v.asDouble()
      case v if v.isBoolean => v.asBoolean()
      case v if v.isNull => null
      case v => v.asText()
    }
    conv(mapper.readTree(json)).asInstanceOf[Map[String, Any]]
  }
}

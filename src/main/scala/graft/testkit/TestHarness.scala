package graft.testkit

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import org.apache.spark.sql.SparkSession

import graft.core.{EngineConfig, Envelope, EventSchemaRegistry}
import graft.produce.Emitter
import graft.route.RouteRegistry

/** Offline test harness — the reference's `onlyTesting` mode (O15/O16,
  * SURVEY.md §2.1): inject synthetic inputs with [[input]], assert captured
  * emissions via `emitter.getEmittedEvents` / `getParsedEmittedEvents`.
  * No broker involved, matching the reference's testing philosophy
  * (consumer/legacy-consumer.ts:73-81, producer/legacy-producer.ts:57-85).
  *
  * `input` replicates the reference semantics exactly: `code` is computed
  * from `eventName ?? topic` and merged into the payload, then every
  * matching route's handler runs **sequentially** (the reference's offline
  * path awaits handlers one at a time — unlike the online concurrent path).
  * Our dispatch iterates routes in registration order, so ordering parity
  * holds.
  */
final class TestHarness(
    val spark: SparkSession,
    baseConfig: EngineConfig = EngineConfig(),
    clock: () => java.time.Instant = graft.produce.Emitter.WallClock,
    val schemas: EventSchemaRegistry = new EventSchemaRegistry) {

  val config: EngineConfig = baseConfig.copy(onlyTesting = true)
  val emitter: Emitter = new Emitter(config, clock)
  val consumer: RouteRegistry = new RouteRegistry(config, emitter, schemas)

  private val mapper = new ObjectMapper()

  /** Inject one event: payload JSON + topic (+ optional eventName). */
  def input(topic: String, dataJson: String, eventName: Option[String] = None): Unit = {
    val node = mapper.readTree(dataJson) match {
      case o: ObjectNode => o
      case other => throw new IllegalArgumentException(
        s"input data must be a JSON object, got: $other")
    }
    node.put(Envelope.CodeField, Emitter.upperCamel(eventName.getOrElse(topic)))
    inputRaw(topic, node.toString)
  }

  /** Inject a raw (possibly malformed) message value — the analog of the
    * reference integration suite's `sendRawMessage` garbage injection
    * (src/test/helpers.ts:37-51). Malformed JSON must be skipped, not fail. */
  def inputRaw(topic: String, value: String): Unit = {
    import spark.implicits._
    consumer.process(Seq((topic, value)).toDF("topic", "value"))
  }
}

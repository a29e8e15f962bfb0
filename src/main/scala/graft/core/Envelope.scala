package graft.core

import scala.collection.mutable
import org.apache.spark.sql.types._

/** The event envelope (reference producer/legacy-producer.ts:36-48): every
  * produced message is the user payload plus `createdAt`, `appName`, `code`
  * — in that field order (asserted byte-exact by the reference's tests,
  * producer/__tests__/index.test.ts:58-71).
  */
object Envelope {
  /** Reserved key — user payloads may not contain it
    * (producer/legacy-producer.ts:182-184). */
  val CodeField = "code"
  val AppNameField = "appName"
  val CreatedAtField = "createdAt"
  val MetaFields: Seq[String] = Seq(CreatedAtField, AppNameField, CodeField)

  /** Non-standard timestamp variant: `"yyyy-MM-dd HH:mm:ss'Z'"` — space
    * separator, second precision, literal Z (producer/legacy-producer.ts:42). */
  val CreatedAtPattern = "yyyy-MM-dd HH:mm:ss'Z'"

  val metaSchema: StructType = StructType(Seq(
    StructField(CreatedAtField, StringType),
    StructField(AppNameField, StringType),
    StructField(CodeField, StringType)))

  /** Consume-side minimum schema: `code` is the only declared field and it
    * is optional (reference interfaces/index.ts:61-63). */
  val inputSchema: StructType = StructType(Seq(StructField(CodeField, StringType)))
}

/** Per-event-code payload schemas — delivers what the reference's phantom
  * `SchemaRegistryProducer`/`SchemaRegistryConsumerRouter` deprecation shims
  * promise but never implement (producer/legacy-producer.ts:143,149;
  * SURVEY.md §0). The consumer parses each message once with the merged
  * schema; Catalyst then prunes unused fields per route.
  *
  * Unregistered codes still route: the merged schema always contains the
  * envelope meta fields, so schemaless payloads degrade to code-only routing
  * exactly like the reference's `Input {code?}`.
  */
final class EventSchemaRegistry {
  private val schemas = mutable.LinkedHashMap.empty[String, StructType]

  def register(code: String, payload: StructType): this.type = synchronized {
    schemas(code) = payload; this
  }

  def schemaFor(code: String): Option[StructType] = synchronized(schemas.get(code))

  def registeredCodes: Seq[String] = synchronized(schemas.keys.toSeq)

  /** Union of all registered payload schemas plus the envelope meta fields —
    * the schema the router's single `from_json` pass uses. First-registered
    * wins on duplicate field names (consistent with JSON object merge). */
  def mergedSchema: StructType = synchronized {
    val fields = mutable.LinkedHashMap.empty[String, StructField]
    schemas.valuesIterator.foreach(_.fields.foreach { f =>
      if (!Envelope.MetaFields.contains(f.name))
        fields.getOrElseUpdate(f.name, f.copy(nullable = true))
    })
    StructType(fields.values.toSeq ++ Envelope.metaSchema.fields)
  }
}

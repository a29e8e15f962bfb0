package graft.core

/** Migration shim for the reference's config singleton
  * (`setConfig`/`getConfig`, /root/reference/src/config/index.ts:4-18).
  *
  * The Spark-idiomatic way is to pass an immutable [[EngineConfig]]
  * explicitly (every graft API takes one); this shim only exists so code
  * ported 1:1 from the reference keeps working. Same failure contract:
  * `getConfig` before `setConfig` throws.
  */
object GraftConfig {
  @volatile private var current: Option[EngineConfig] = None

  def setConfig(config: EngineConfig): Unit = { current = Some(config) }

  def getConfig: EngineConfig =
    current.getOrElse(throw new IllegalStateException(
      "You must set the configuration first using setConfig"))

  def isSet: Boolean = current.isDefined

  /** Test hygiene: clear global state between suites. */
  def reset(): Unit = { current = None }
}

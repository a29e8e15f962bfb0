package graft.examples

import org.apache.spark.sql.SparkSession

import graft.core.EngineConfig
import graft.testkit.TestHarness

/** Runnable end-to-end demo of the event layer's public API:
  * consume → route → transform → re-emit → capture, offline (the
  * reference's `onlyTesting` workflow). `sbt "runMain graft.examples.RouterDemo"`.
  */
object RouterDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-router-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val h = new TestHarness(spark,
      EngineConfig(appName = Some("demo-app"), groupId = Some("demo-group")))

    // consume-transform-produce pipeline (reference O14)
    h.consumer.add("orders", "order-created", (df, emit) => {
      if (!df.isEmpty)
        emit.emit(df.selectExpr("upper(code) AS audited"), "audit", Some("order-audited"))
    })
    // global listener: fires for every message on the topic, even without code
    h.consumer.add("orders", (df, _) =>
      println(s"[global listener] saw ${df.count()} message(s)"))

    h.input("orders", """{"orderId": 42, "total": 99.9}""", Some("order-created"))
    h.inputRaw("orders", "this is not json")   // malformed: skipped, not fatal

    println("captured emits: " + h.emitter.getEmittedEvents)
    println("parsed: " + h.emitter.getParsedEmittedEvents)
    spark.stop()
  }
}

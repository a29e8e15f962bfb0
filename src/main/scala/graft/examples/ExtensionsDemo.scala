package graft.examples

import org.apache.spark.sql.SparkSession

import graft.plans.GraftExtensions

/** Proves the `spark.sql.extensions` wiring: a fresh session built with
  * [[GraftExtensions]] can call the custom expressions from plain SQL.
  * `sbt "runMain graft.examples.ExtensionsDemo"`. */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .appName("graft-extensions-demo")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val row = spark.sql(
      """SELECT upper_camel('my-event_name x') AS code,
        |       dot_product(array(1d, 2d, 3d), array(4d, 5d, 6d)) AS dot""".stripMargin)
      .head()
    println(s"upper_camel -> ${row.getString(0)}, dot_product -> ${row.getDouble(1)}")
    assert(row.getString(0) == "MyEventNameX")
    assert(row.getDouble(1) == 32.0)
    println("extensions OK")
    spark.stop()
  }
}

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
    // the full expression surface is SQL-callable through the extension
    val row2 = spark.sql(
      """SELECT shingle_arr(array('a', 'b', 'c', 'd'), 3) AS sh,
        |       minhash_sigs(array('a b c', 'b c d')) AS sig,
        |       simhash_md5(array('a', 'b')) AS h32,
        |       simhash_md5_64(array('a', 'b')) AS h64,
        |       simhash64(array('a', 'b')) AS hx""".stripMargin)
      .head()
    assert(row2.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(row2.getSeq[Long](1).length == 8)
    assert(!row2.isNullAt(2) && !row2.isNullAt(3) && !row2.isNullAt(4))
    println("extensions OK")
    spark.stop()
  }
}

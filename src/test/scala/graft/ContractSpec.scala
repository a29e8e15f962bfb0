package graft

/** Driver-contract guard: the shapes the harness relies on.
  *  - `entry` returns rows at sf0.001 (t1 smoke);
  *  - every `oracleSql` key has a matching query;
  *  - every registered query executes and returns rows at sf0.001.
  */
class ContractSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("entry smoke: flagship query returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a query; names are well-formed") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(qs)
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
    qs.foreach(n => assert(n.matches("[a-z][a-z0-9_]+"), s"bad name $n"))
  }

  test("every registered query executes and returns rows at sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with zero rows at sf0.001: $empty")
  }
}

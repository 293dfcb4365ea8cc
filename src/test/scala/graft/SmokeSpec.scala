package graft

/** Every declared query runs at sf0.001; flagship entry returns rows. */
class SmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query executes at sf0.001") {
    val dir = sf("sf0.001")
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try { fn(spark, dir).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("oracle map only names declared queries") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracles without queries: $unknown")
  }

  test("scale-up factor guard admits the documented range") {
    ScaleUp.checkFactor(1)
    ScaleUp.checkFactor(10)  // the default invocation and SCALE.md's curve
    ScaleUp.checkFactor(30)  // stress runs (bip30 family excluded there)
    ScaleUp.checkFactor(100) // chain-build decade-up probes
    intercept[IllegalArgumentException] { ScaleUp.checkFactor(0) }
    intercept[IllegalArgumentException] { ScaleUp.checkFactor(101) }
  }
}

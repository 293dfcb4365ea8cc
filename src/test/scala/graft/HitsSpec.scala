package graft

import org.apache.spark.sql.functions._

import graft.operators.Hits

/** The fixed-point integer HITS must match hand-computed floor
  * arithmetic exactly, be a pure function of the graph, and keep its
  * max-normalization invariant (some score == Scale every round). */
class HitsSpec extends SparkSpec {
  import spark.implicits._

  private def hits(edges: Seq[(String, String)],
      iters: Int): Map[String, (Long, Long)] = {
    val e = edges.toDF("src", "dst")
    Hits.runFromEdges(e, iters)
      .select(col("node"), col("hub"), col("authority"))
      .as[(String, Long, Long)].collect()
      .map { case (n, h, a) => n -> (h, a) }.toMap
  }

  test("zero rounds fail loudly (no meaningful 0-round hub/authority)") {
    val e = Seq(("a", "b")).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      Hits.runFromEdges(e, 0)
    }
    assert(ex.getMessage.contains("at least one round"))
  }

  test("star graph matches hand-computed floor arithmetic") {
    // a->b, a->c, b->c; Scale = 1e6, h0 = 1e6 everywhere.
    // r1: araw = (a:0, b:1e6, c:2e6) → a1 = (0, 500000, 1000000)
    //     hraw = (a:1500000, b:1000000, c:0) → h1 = (1000000, 666666, 0)
    // r2: araw = (0, 1000000, 1666666) → a2 = (0, 600000, 1000000)
    //     hraw = (1600000, 1000000, 0) → h2 = (1000000, 625000, 0)
    val r = hits(Seq("a" -> "b", "a" -> "c", "b" -> "c"), 2)
    assert(r === Map(
      "a" -> (1000000L, 0L),
      "b" -> (625000L, 600000L),
      "c" -> (0L, 1000000L)))
  }

  test("2-cycle is a fixpoint at Scale") {
    val r = hits(Seq("x" -> "y", "y" -> "x"), 3)
    assert(r === Map("x" -> (1000000L, 1000000L),
      "y" -> (1000000L, 1000000L)))
  }

  test("deterministic: identical graph gives identical scores") {
    val edges = for { a <- 1 to 20; b <- 1 to 20; if a != b && (a + b) % 3 == 0 }
      yield (s"n$a", s"n$b")
    assert(hits(edges, 3) === hits(edges, 3))
  }

  test("max-normalization invariant: top hub and authority sit at Scale") {
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "c" -> "d",
      "d" -> "a", "a" -> "d")
    val r = hits(edges, 3)
    assert(r.values.map(_._1).max === Hits.Scale)
    assert(r.values.map(_._2).max === Hits.Scale)
    assert(r.values.forall { case (h, a) => h >= 0 && a >= 0 })
  }
}

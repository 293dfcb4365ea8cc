package graft

import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents

/** Connected components must agree with a driver-side union-find on
  * graphs of every awkward shape, converge in logarithmic rounds, and be
  * insensitive to edge orientation/duplication. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(x => x -> find(x)).toMap
  }

  private def check(edges: Seq[(Long, Long)], maxIter: Int = 40): Unit = {
    val got = ConnectedComponents
      .run(edges.toDF("a", "b"), maxIter)
      .as[(Long, Long)].collect().toMap
    assert(got === unionFind(edges))
  }

  test("paths, cycles, stars, cliques and forests match union-find") {
    check(Seq((1L, 2L)))
    check((1L to 511L).map(i => (i, i + 1)))            // long path
    check((1L to 100L).map(i => (i, i % 100 + 1)))      // cycle
    check((2L to 64L).map(i => (1L, i)))                // star
    check(for { a <- 1L to 12L; b <- 1L to 12L; if a < b } yield (a, b))
    // forest of 40 components with shuffled, duplicated, reversed edges
    val forest = for {
      c <- 0L until 40L; i <- 0L until 9L
    } yield (c * 100 + i, c * 100 + i + 1)
    val noisy = new scala.util.Random(7)
      .shuffle(forest ++ forest.map(_.swap) ++ forest)
    val got = ConnectedComponents.run(noisy.toDF("x", "y"))
      .as[(Long, Long)].collect().toMap
    assert(got === unionFind(forest))
    assert(got.values.toSet.size === 40)
  }

  test("random graphs at several densities match union-find") {
    val rnd = new scala.util.Random(42)
    for (m <- Seq(30, 120, 400)) {
      val edges = Seq.fill(m)(
        (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
        .filter(e => e._1 != e._2)
      check(edges)
    }
  }

  test("self-loops and duplicate edges are ignored, strings order correctly") {
    val labeled = ConnectedComponents.run(
      Seq(("b", "b"), ("b", "c"), ("c", "b"), ("x", "y"), ("q", "q"))
        .toDF("s", "t")).as[(String, String)].collect().toMap
    // q appears only in a self-loop: still a node, its own singleton
    assert(labeled === Map("b" -> "b", "c" -> "b", "x" -> "x", "y" -> "x",
      "q" -> "q"))
  }

  test("labels covers isolated nodes as singletons") {
    val nodes = (1L to 10L).toDF("node")
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("a", "b")
    val got = ConnectedComponents.labels(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L,
      6L -> 6L, 7L -> 7L, 8L -> 8L, 9L -> 7L, 10L -> 10L))
  }

  test("a high-degree hub with pendant chains stays correct") {
    // the skew shape large-star exists for: one hub with thousands of
    // neighbors, some of which chain further — per-node reducer state is
    // the true neighborhood, never the whole component
    val hub = (1L to 4000L).map(i => (0L, i))
    val chains = (1L to 50L).map(i => (i, 10000L + i))
    check(hub ++ chains)
  }

  test("incremental labels equal a full re-clustering on random growth") {
    // split random graphs into an "old" graph (nodes < 150) and a batch
    // (nodes >= 150): incrementalLabels over base labels + touch edges
    // must equal labels() over the union, including merges of previously
    // separate old components through a new node, and isolated batch
    // nodes as singletons
    val rnd = new scala.util.Random(7)
    for (m <- Seq(60, 250)) {
      val edges = Seq.fill(m)(
        (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
        .filter(e => e._1 != e._2)
      val nodes = (0L until 200L)
      val isNew = (n: Long) => n >= 150
      val oldEdges = edges.filter(e => !isNew(e._1) && !isNew(e._2))
      val touch = edges.filter(e => isNew(e._1) || isNew(e._2))
      val base = ConnectedComponents.labels(
        nodes.filter(!isNew(_)).toDF("node"), oldEdges.toDF("u", "v"))
      val inc = ConnectedComponents.incrementalLabels(
        base, nodes.filter(isNew).toDF("node"), touch.toDF("u", "v"))
        .as[(Long, Long)].collect().toMap
      val full = ConnectedComponents.labels(
        nodes.toDF("node"), edges.toDF("u", "v"))
        .as[(Long, Long)].collect().toMap
      assert(inc === full, s"incremental != full at m=$m")
    }
  }

  test("incremental labels reject touch edges outside the known universe") {
    val base = ConnectedComponents.labels(
      Seq(1L, 2L).toDF("node"), Seq((1L, 2L)).toDF("u", "v"))
    val ex = intercept[IllegalArgumentException] {
      ConnectedComponents.incrementalLabels(
        base, Seq(10L).toDF("node"),
        // 99 is in neither the old labels nor the batch
        Seq((10L, 99L)).toDF("u", "v")).collect()
    }
    assert(ex.getMessage.contains("neither oldLabels nor newNodes"))
  }

  test("a 512-node path converges within logarithmic rounds") {
    // naive min-propagation needs ~512 rounds here; the star algorithm
    // must finish in far fewer (paper bound O(log n), 40 is generous)
    check((1L to 512L).map(i => (i, i + 1)), maxIter = 40)
  }
}

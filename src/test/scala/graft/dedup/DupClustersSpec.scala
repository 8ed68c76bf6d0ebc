package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DupClustersSpec extends SparkSpec {
  import spark.implicits._

  /** Runs BOTH the distributed star rounds and the adaptive
    * driver-side union-find finisher; asserts they agree. */
  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val local = DupClusters.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    val dist = DupClusters.connectedComponents(edges.toDF("a", "b"), "a", "b",
        localEdgeThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(local == dist, s"local/distributed CC disagree: $local vs $dist")
    local
  }

  test("chain contracts to its minimum (worst case for propagation)") {
    val comp = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)))
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 1L))
  }

  test("separate components keep separate minima") {
    val comp = cc(Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L), (31L, 30L)))
    assert(comp == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("edge direction and duplicates don't matter") {
    val comp = cc(Seq((5L, 1L), (1L, 5L), (5L, 1L), (3L, 5L)))
    assert(comp == Map(1L -> 1L, 3L -> 1L, 5L -> 1L))
  }

  test("self-loops and empty edge lists are handled") {
    assert(cc(Seq((7L, 7L))) == Map.empty)
    assert(cc(Seq.empty) == Map.empty)
  }

  test("dedupKeepMin keeps one row per cluster plus all untouched rows") {
    val docs = Seq((1L, "a"), (2L, "a'"), (3L, "a''"), (4L, "b"), (5L, "c"))
      .toDF("id", "text")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("x", "y")
    val kept = DupClusters.dedupKeepMin(docs, "id", edges, "x", "y")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 5L))
  }

  test("dense clique converges") {
    val nodes = (1L to 8L)
    val edges = for (a <- nodes; b <- nodes if a < b) yield (a, b)
    val comp = cc(edges)
    assert(comp == nodes.map(_ -> 1L).toMap)
  }
}

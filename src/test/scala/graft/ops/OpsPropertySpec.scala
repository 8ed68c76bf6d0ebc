package graft.ops

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.dedup.DupClusters

/** Property-based laws for the round-2 operators, with deterministic
  * seed sweeps (same scheme as graft.PropertySpec). Randomized graphs /
  * event sets / series are checked against independently computed
  * in-memory oracles. */
class OpsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](gen: Gen[A], seed: Long): Option[A] =
    gen.apply(Gen.Parameters.default, Seed(seed))

  test("connectedComponents matches in-memory union-find on random graphs") {
    val genEdges = Gen.listOfN(25,
      Gen.zip(Gen.choose(0L, 19L), Gen.choose(0L, 19L)))
    (0 until 8).foreach { i =>
      sample(genEdges, i.toLong).foreach { edges =>
        val real = edges.filter(e => e._1 != e._2)
        if (real.nonEmpty) {
          // driver-side union-find oracle
          val parent = scala.collection.mutable.Map[Long, Long]()
          def find(x: Long): Long = {
            val p = parent.getOrElseUpdate(x, x)
            if (p == x) x else { val r = find(p); parent(x) = r; r }
          }
          real.foreach { case (a, b) =>
            val (ra, rb) = (find(a), find(b))
            if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
          }
          val expected = parent.keys.map(n => n -> find(n)).toMap
          // exercise BOTH the distributed star rounds and the
          // adaptive driver-side finisher
          val gotDist = DupClusters.connectedComponents(
            real.toDF("a", "b"), "a", "b", localEdgeThreshold = 0)
            .as[(Long, Long)].collect().toMap
          val gotLocal = DupClusters.connectedComponents(
            real.toDF("a", "b"), "a", "b")
            .as[(Long, Long)].collect().toMap
          assert(gotDist == expected, s"seed=$i edges=$real")
          assert(gotLocal == expected, s"seed=$i edges=$real")
        }
      }
    }
  }

  test("sessionize: session ids are 0-based, contiguous, and gap-consistent") {
    val genEvents = Gen.listOfN(40,
      Gen.zip(Gen.choose(0, 2), Gen.choose(0L, 1000L)))
    (0 until 8).foreach { i =>
      sample(genEvents, 100L + i).foreach { evs =>
        val df = evs.zipWithIndex
          .map { case ((k, t), id) => (s"u$k", t, id.toLong) }
          .toDF("k", "t", "id")
        val out = Sessions.sessionize(df, "k", "t", gap = 100L, tieBreak = Seq("id"))
          .select("k", "t", "id", "session_id")
          .as[(String, Long, Long, Long)].collect()
        out.groupBy(_._1).foreach { case (_, rows) =>
          val sorted = rows.sortBy(r => (r._2, r._3))
          assert(sorted.head._4 == 0L)
          sorted.sliding(2).foreach {
            case Array(a, b) =>
              val gapExceeded = b._2 - a._2 > 100L
              val expectedNext = if (gapExceeded) a._4 + 1 else a._4
              assert(b._4 == expectedNext, s"seed=$i $a -> $b")
            case _ => ()
          }
        }
      }
    }
  }

  test("asof union-merge, broadcast, and native agree on random series") {
    val genL = Gen.listOfN(30, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 50L)))
    val genR = Gen.listOfN(15, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 50L)))
    (0 until 6).foreach { i =>
      (sample(genL, 200L + i), sample(genR, 300L + i)) match {
        case (Some(ls), Some(rs)) =>
          val left = ls.zipWithIndex
            .map { case ((k, t), id) => (id.toLong, k, t) }.toDF("id", "k", "t")
          val right = rs.distinct.groupBy(identity).keys.toSeq
            .map { case (k, t) => (k, t, s"p$k-$t") }.toDF("rk", "rt", "payload")
          val a = AsofJoin.asofBackward(left, right, "k", "rk", "t", "rt")
            .collect().map(_.toSeq).toSet
          val b = AsofJoin.asofBackwardBroadcast(left, right, "k", "rk", "t", "rt")
            .collect().map(_.toSeq).toSet
          val c = graft.plans.AsofJoinNative.asof(left, right, "k", "rk", "t", "rt")
            .collect().map(_.toSeq).toSet
          assert(a == b, s"seed=$i broadcast diverged")
          assert(a == c, s"seed=$i native diverged")
        case _ => ()
      }
    }
  }
}

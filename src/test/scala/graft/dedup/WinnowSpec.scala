package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The winnowing GUARANTEE (Schleimer SIGMOD'03 Thm 1): any verbatim
  * token run of length ≥ w+k−1 shared by two documents produces at
  * least one shared fingerprint. Property-tested with random documents
  * and a planted shared run, plus bloomSemiJoin ≡ plain semi-join on
  * random id sets. */
class WinnowSpec extends SparkSpec {

  private def forAll[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  private val k = 3
  private val w = 4
  private val word = Gen.oneOf("alpha", "bravo", "carol", "delta", "echo",
    "fox", "golf", "hotel", "india", "julia")
  private val doc = Gen.listOfN(20, word).map(_.mkString(" "))

  test("winnowing guarantee: shared run of w+k-1 tokens => shared fingerprint") {
    import spark.implicits._
    val run = Gen.listOfN(w + k - 1, word)
    forAll(Gen.zip(doc, doc, run), 10) { case (a, b, shared) =>
      val sharedTxt = shared.mkString(" ")
      val docs = Seq(
        (1L, s"$a $sharedTxt"),     // run at the end of doc 1
        (2L, s"$sharedTxt $b"))     // run at the start of doc 2
        .toDF("doc_id", "text")
      val fps = Dedup.winnowFingerprints(docs, "doc_id", "text", k, w)
      val common = fps.filter(col("doc_id") === 1L).select("fp")
        .intersect(fps.filter(col("doc_id") === 2L).select("fp"))
        .count()
      assert(common >= 1,
        s"no shared fingerprint for planted run '$sharedTxt'")
    }
  }

  test("winnowing is position-robust: fingerprints of a doc are a subset " +
      "of a doc with a prefix prepended, for the suffix region") {
    import spark.implicits._
    // prepending text only ADDS fingerprints from the boundary region;
    // every fingerprint of the original interior survives
    forAll(Gen.zip(doc, doc), 5) { case (prefix, body) =>
      val docs = Seq((1L, body), (2L, s"$prefix $body")).toDF("doc_id", "text")
      val fps = Dedup.winnowFingerprints(docs, "doc_id", "text", k, w)
      val only1 = fps.filter(col("doc_id") === 1L).select("fp")
        .except(fps.filter(col("doc_id") === 2L).select("fp")).count()
      assert(only1 == 0,
        "original doc has fingerprints the extended doc lost")
    }
  }

  test("bloomSemiJoin equals plain semi-join on random id sets") {
    import spark.implicits._
    val ids = Gen.listOfN(300, Gen.chooseNum(0L, 999L))
    forAll(Gen.zip(ids, Gen.listOfN(40, Gen.chooseNum(0L, 999L))), 5) {
      case (factIds, dimIds) =>
        val fact = factIds.toDF("id")
        val dim = dimIds.toDF("k")
        val viaBloom = graft.ops.Scale.bloomSemiJoin(
            fact, col("id"), dim, col("k"), expectedItems = 64L)
          .collect().map(_.getLong(0)).sorted.toSeq
        val plain = fact.join(dim, col("id") === col("k"), "left_semi")
          .collect().map(_.getLong(0)).sorted.toSeq
        assert(viaBloom == plain)
    }
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** At-scale probe for the full-corpus distributed Lloyd trainer
  * (`similarity/Kmeans`): synthesizes n clustered vectors (k planted
  * centers + per-row deterministic noise), then measures
  *
  *   - seed pick (md5-rank top-k: one TakeOrdered pass),
  *   - each Lloyd iteration's wall (assign map-only + ONE narrow
  *     update exchange + k-row collect),
  *   - the update plan's exchange count (asserted == 1 — the claim in
  *     Kmeans' scaladoc, checked on the executed plan),
  *   - recovery: planted-center spike found in every centroid after
  *     the run, and cluster sizes ≈ n/k.
  *
  * Usage: tools/run_main.sh graft.tools.KmeansProbe [n] [dims] [k] [iters]
  * (defaults 2,000,000 × 64, k=64, 3 iterations).
  */
object KmeansProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val dims = args.lift(1).map(_.toInt).getOrElse(64)
    val k = args.lift(2).map(_.toInt).getOrElse(64)
    val iters = args.lift(3).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // planted clusters: center c spikes dimension (c % dims) at 10,
    // noise is a deterministic pmod hash in [0, 0.5)
    val vecs = spark.range(n)
      .select(col("id").as("vec_id"),
        expr(s"""transform(sequence(1, $dims), j ->
          cast(CASE WHEN j - 1 = pmod(id, $k) % $dims THEN 10.0 ELSE 0.0 END
               + pmod(id * j, 997) / 2000.0 AS float))""").as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vecs.count() // materialize so the probe times k-means, not codegen

    def tsec[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val (seeds, tSeed) =
      tsec(graft.similarity.Kmeans.md5Seeds(vecs, "vec_id", "embedding", k))
    println(f"seed_pick(md5 top-$k of $n): $tSeed%.2f s")

    // exchange count of one update, on the executed (AQE-final) plan
    // string — the repo's spec convention; a node-type collect would
    // stop at the AdaptiveSparkPlanExec boundary and see nothing
    val upd = graft.similarity.Kmeans
      .updateStats(vecs, "vec_id", "embedding", seeds)
    upd.collect()
    // the adaptive plan string prints BOTH the final and the initial
    // plan; count only the executed (final) section
    val planStr = upd.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges =
      "Exchange hashpartitioning\\(list_id".r.findAllIn(planStr).size
    println(s"update exchanges: $exchanges (claim: 1, on list_id only)")
    require(exchanges == 1 && !"Exchange (?!hashpartitioning\\(list_id)".r
        .findFirstIn(planStr).isDefined,
      s"expected exactly ONE list_id exchange:\n$planStr")

    var cents = seeds
    (1 to iters).foreach { i =>
      val (next, t) = tsec(
        graft.similarity.Kmeans.step(vecs, "vec_id", "embedding", cents))
      val shift = cents.zip(next).map { case ((_, a), (_, b)) =>
        math.sqrt(a.zip(b).map { case (x, y) =>
          (x - y).toDouble * (x - y) }.sum)
      }.max
      cents = next
      println(f"iter $i: $t%.2f s, max centroid shift $shift%.4f")
    }

    // recovery: every centroid's argmax dimension is its planted spike
    val spikes = cents.map { case (_, c) =>
      c.indexOf(c.max)
    }.toSet
    val sizes = graft.similarity.Kmeans
      .assign(vecs, graft.similarity.Kmeans.KmeansModel(cents, iters, 0.0),
        "vec_id", "embedding")
      .groupBy("list_id").count().collect().map(_.getLong(1))
    println(s"recovered spike dims: ${spikes.size} distinct of $k centroids; " +
      s"cluster sizes min=${sizes.min} max=${sizes.max} " +
      s"(ideal ${n / k})")
    spark.stop()
  }
}

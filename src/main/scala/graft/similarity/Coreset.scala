package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.expressions.GraftExtensions

/** Greedy k-center / farthest-point selection — the diversity-sampling
  * primitive of data curation (coreset seeding, diverse exemplar
  * picking, active-learning batch selection; Gonzalez 1985's 2-approx
  * greedy, used at dataset scale in Sener & Savarese ICLR 2018).
  * Where `Kmeans`/`q_cluster_sample` sample PROPORTIONALLY to the
  * density, this picks the points that COVER the space: each pick is
  * the corpus row farthest (max–min L2) from everything chosen so far.
  *
  * Dataflow shape: the classic incremental form. A persisted
  * (id, v, maxscore) frame carries each row's best
  * `v·c − ‖c‖²/2` over the chosen set (the SAME score NearestList
  * maximizes, so min-L2² = ‖v‖² − 2·maxscore); each of the k−1
  * iterations is ONE map-only column update (`greatest` with the dot
  * against the newly chosen center — O(d) per row, NOT O(t·d)) plus a
  * TakeOrdered(1) argmax collect. No shuffle anywhere — at 100 TB the
  * cost is k corpus scans, which is the inherent price of EXACT greedy
  * k-center (each pick depends on the previous); at most two
  * iterations' frames are cached at a time.
  *
  * Engine-neutral determinism (the md5-seed idiom): the seed is the
  * md5-rank-min row, every dot accumulates left-to-right in double on
  * both engines (`list_dot_product` in DuckDB), argmax ties break by
  * id ascending — so the WHOLE greedy loop is DuckDB-expressible as
  * chained MATERIALIZED CTEs and hash-gated in `q_kcenter` (the
  * `q_bpe_learn_oracle` pattern: the loop itself under the oracle, not
  * just one step).
  *
  * Reference scope: vector-io ships no subset selection; beyond-parity
  * training-data layer (SURVEY §7.5).
  */
object Coreset {

  /** One greedy pick: selection rank (0 = the md5 seed), the row id,
    * the row's min squared L2 distance to all PRIOR picks at selection
    * time (0 for the seed; the sequence is non-increasing — pick t's
    * value is the covering radius² of the first t centers), and the
    * vector itself (as doubles, the shared numeric currency). */
  final case class Pick(rank: Int, id: Any, minDistSq: Double,
      vec: Array[Double])

  /** `v·c − ‖c‖²/2` with the half-norm folded left-to-right exactly as
    * the DuckDB side's `list_dot_product(c, c) / 2`. */
  private def scoreTo(c: Array[Double]): Column = {
    val half = c.map(x => x * x).sum / 2.0
    GraftExtensions.dot(col("__v"), lit(c)) - lit(half)
  }

  /** Greedy farthest-point selection of k rows. Null vectors and
    * vectors with null ELEMENTS are excluded (a partial vector has no
    * well-defined distance — the MatVecProject stance, and the oracle
    * side's filter); ids must be distinct (ties break by id). */
  def select(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int): Seq[Pick] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val base = vecs
      .select(col(idCol).as("__id"), col(vecCol).cast("array<double>").as("__v"))
      .filter(col("__v").isNotNull && !exists(col("__v"), _.isNull))
    def vecOf(r: Row): Array[Double] = r.getSeq[Double](1).toArray

    val seed = base
      .orderBy(md5(col("__id").cast("string")), col("__id")).limit(1).head()
    var picks = List(Pick(0, seed.get(0), 0.0, vecOf(seed)))

    var state = base.withColumn("__ms", scoreTo(vecOf(seed))).persist()
    var prev: Option[DataFrame] = None
    for (t <- 1 until k) {
      val far = state
        .withColumn("__md",
          GraftExtensions.dot(col("__v"), col("__v")) - lit(2.0) * col("__ms"))
        .orderBy(col("__md").desc, col("__id")).limit(1).head()
      // the head() above materialized `state` — the frame it was
      // derived from can drop out of the cache now
      prev.foreach(_.unpersist())
      // a re-picked id means every remaining row sits at distance 0
      // from the chosen set (k exceeds the corpus's distinct-vector
      // diversity) — fail loudly instead of returning duplicate picks
      require(!picks.exists(_.id == far.get(0)),
        s"k=$k exceeds the corpus's distinct-vector diversity: pick $t " +
          s"re-selected id ${far.get(0)} (all remaining min-dists are 0)")
      picks ::= Pick(t, far.get(0), far.getDouble(3), vecOf(far))
      if (t < k - 1) {
        prev = Some(state)
        state = state.withColumn("__ms",
          greatest(col("__ms"), scoreTo(vecOf(far)))).persist()
      }
    }
    state.unpersist()
    prev.foreach(_.unpersist())
    picks.reverse
  }

  /** The covering radius² of the selection over the corpus: one more
    * map-only pass computing max over rows of min-dist² to ALL k
    * picks. (The last pick's `minDistSq` covers only the first k−1.) */
  def radiusSq(vecs: DataFrame, idCol: String, vecCol: String,
      picks: Seq[Pick]): Double = {
    require(picks.nonEmpty)
    val ms = picks.map(p => scoreTo(p.vec)).reduce(greatest(_, _))
    vecs.select(col(idCol).as("__id"),
        col(vecCol).cast("array<double>").as("__v"))
      .filter(col("__v").isNotNull && !exists(col("__v"), _.isNull))
      .select(max(GraftExtensions.dot(col("__v"), col("__v")) - lit(2.0) * ms))
      .head().getDouble(0)
  }
}

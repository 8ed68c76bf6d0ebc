package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregates over vector columns (SURVEY §7.3's "Aggregator if
  * perf demands" for A5 elementwise min/max).
  *
  * `q_vec_minmax` computes per-dimension stats by posexploding — d×
  * row amplification ahead of the exchange (fine when d·groups is
  * small, the partial aggregate absorbs it). This Aggregator is the
  * other formulation: ONE buffer of 3 double-arrays per group per
  * partition, vectors never explode, the exchange carries one row per
  * (group × partition). The win grows with d and with input row count;
  * the posexplode form remains better when groups are huge and d tiny.
  * Same results either way — `q_vec_stats` puts this path behind the
  * DuckDB oracle gate next to q_vec_minmax's exploded path.
  */
object VectorAggregates {

  final case class VecStats(min: Array[Double], max: Array[Double],
      sum: Array[Double], n: Long)

  /** Elementwise (min, max, sum, count) over Array[Float] rows.
    * Null/empty rows are skipped; dimensions are fixed by the first
    * non-null vector (ragged inputs fail fast). */
  object ElementwiseStats extends Aggregator[Seq[Float], VecStats, VecStats] {
    override def zero: VecStats =
      VecStats(Array.empty, Array.empty, Array.empty, 0L)

    private def init(v: Seq[Float]): VecStats = {
      val d = v.length
      val mn = new Array[Double](d); val mx = new Array[Double](d)
      val sm = new Array[Double](d)
      var i = 0
      while (i < d) {
        val x = v(i).toDouble
        mn(i) = x; mx(i) = x; sm(i) = x; i += 1
      }
      VecStats(mn, mx, sm, 1L)
    }

    override def reduce(b: VecStats, v: Seq[Float]): VecStats =
      if (v == null || v.isEmpty) b
      else if (b.n == 0L) init(v)
      else {
        require(v.length == b.min.length,
          s"ragged vectors: ${v.length} vs ${b.min.length}")
        var i = 0
        while (i < v.length) {
          val x = v(i).toDouble
          if (x < b.min(i)) b.min(i) = x
          if (x > b.max(i)) b.max(i) = x
          b.sum(i) += x
          i += 1
        }
        VecStats(b.min, b.max, b.sum, b.n + 1L)
      }

    override def merge(a: VecStats, b: VecStats): VecStats =
      if (a.n == 0L) b
      else if (b.n == 0L) a
      else {
        require(a.min.length == b.min.length,
          s"ragged buffers: ${a.min.length} vs ${b.min.length}")
        var i = 0
        while (i < a.min.length) {
          if (b.min(i) < a.min(i)) a.min(i) = b.min(i)
          if (b.max(i) > a.max(i)) a.max(i) = b.max(i)
          a.sum(i) += b.sum(i)
          i += 1
        }
        VecStats(a.min, a.max, a.sum, a.n + b.n)
      }

    override def finish(b: VecStats): VecStats = b
    override def bufferEncoder: Encoder[VecStats] = Encoders.product[VecStats]
    override def outputEncoder: Encoder[VecStats] = Encoders.product[VecStats]
  }

  /** Untyped-DataFrame handle: `df.agg(elementwiseStats(col("vec")))`
    * yields a struct<min:array<double>, max:array<double>,
    * sum:array<double>, n:bigint>. */
  val elementwiseStats: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(ElementwiseStats)
}

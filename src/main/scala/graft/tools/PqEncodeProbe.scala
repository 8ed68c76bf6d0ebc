package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.expressions.GraftExtensions

/** A/B for the PQ corpus-encode stage at the ksub real PQ uses:
  * the pre-r13c per-code formulation (m × ksub inlined l2Sq loops —
  * one huge generated method) vs the fused `PqEncode` expression
  * (constant-size method), on n synthetic vectors with m=8 subspaces.
  * Both arms force full evaluation via an aggregate over the codes
  * and are asserted to produce the SAME aggregate.
  *
  * Usage: tools/run_main.sh graft.tools.PqEncodeProbe [n] [ksub]
  * (defaults 1,000,000 and 256; dims fixed at 64 = 8×8).
  */
object PqEncodeProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val ksub = args.lift(1).map(_.toInt).getOrElse(256)
    val (m, dsub) = (8, 8)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val codebooks: Array[Array[Array[Float]]] = Array.tabulate(m)(s =>
      Array.tabulate(ksub)(c =>
        Array.tabulate(dsub)(j => (math.sin(s * 7919 + c * 131 + j) * 2).toFloat)))
    val vecs = spark.range(n)
      .select(col("id"),
        expr(s"transform(sequence(1, ${m * dsub}), j -> " +
          "cast(pmod(id * j, 1009) / 252.0 - 2.0 AS float))").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vecs.count()

    def tsec[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def force(codes: org.apache.spark.sql.Column): Long =
      vecs.select(codes.as("codes"))
        .agg(sum(expr("aggregate(codes, 0L, (a, x) -> a + x)")))
        .collect().head.getLong(0)

    val oldForm = array(codebooks.indices.map { s =>
      val sub = slice(col("v"), s * dsub + 1, dsub)
      val dists = array(codebooks(s).map(c =>
        GraftExtensions.l2Sq(sub, lit(c))): _*)
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }: _*)
    val fused = org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.PqEncode(
        org.apache.spark.sql.graftbridge.Bridge.expression(col("v")),
        codebooks))

    val (sumF, tF0) = tsec(force(fused))
    val (_, tF) = tsec(force(fused)) // warm pass is the honest number
    println(f"fused PqEncode:    $tF%.2f s (first pass $tF0%.2f s) " +
      s"[n=$n, m=$m, ksub=$ksub]")
    val (sumO, tO) = tsec(force(oldForm))
    println(f"per-code l2Sq old: $tO%.2f s")
    require(sumF == sumO, s"code sums differ: $sumF vs $sumO")
    println(f"agree (code-sum $sumF); old/fused = ${tO / tF}%.1fx")
    spark.stop()
  }
}

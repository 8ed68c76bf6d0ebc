package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generates a ≥1 GiB input directory by sharded replication of
  * /root/testdata/sf0.1, to exercise the AT-SCALE branch of the
  * size-gated cost model (QueriesCommon.table: AQE on, session-default
  * shuffle fan-out, bare scans) that the three driver SFs — all far
  * below the 1 GiB threshold — never reach.
  *
  * Replication is SHARDED: every key column is shifted by
  * replicaIndex * (max(key)+1), so replica i is a self-contained copy
  * of the star schema and joins never cross replicas — per-join-key
  * cardinalities stay what they were at sf0.1 while table sizes and
  * group counts grow by the factor. nation/region (the 25/5-row dims
  * keyed 0..N) are copied unshifted and stay joinable from every
  * replica, exactly like a real deployment's small dimensions.
  *
  * The corpus tables (documents/embeddings/events) replicate at a
  * smaller factor than the TPC-H tables: the dedup/near-dup operators
  * are pair-quadratic per duplicate group, and exact replicas put every
  * copy in one group — a deliberately adversarial duplication profile
  * whose output grows factor²-per-group. ×8 keeps those outputs
  * checkable in DuckDB while the directory total still clears 1 GiB on
  * the ×80 fact tables. embedding[0] gets a +i/1000 perturbation so
  * replicated vectors are near- but not exact-duplicates — cosine
  * top-k stays tie-free (rank determinism) and near-dup thresholds
  * still group the replicas.
  *
  * Output is written as `fanout` files per table so the scans are
  * splittable (the sf0.1 files are single-row-group, i.e. one task no
  * matter the cluster width).
  */
object BigGen {
  def main(args: Array[String]): Unit = {
    val srcDir = "/root/testdata/sf0.1"
    val outDir = args.headOption.getOrElse("/root/repo/target/bigdata")
    val bigFactor = args.lift(1).map(_.toInt).getOrElse(80)
    val corpusFactor = args.lift(2).map(_.toInt).getOrElse(8)
    val fanout = 32

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def src(name: String): DataFrame =
      spark.read.parquet(s"$srcDir/$name.parquet")

    /** max(key)+1 — the per-replica shift stride for an id column. */
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L

    /** Replicate `factor`×, shifting each (column -> stride) by
      * replicaIndex * stride. One scan; the explode is map-side. */
    def replicate(df: DataFrame, factor: Int,
        shifts: Map[String, Long]): DataFrame = {
      val rep = df.withColumn("__rep",
        explode(sequence(lit(0), lit(factor - 1))))
      shifts.foldLeft(rep) { case (d, (c, s)) =>
        d.withColumn(c, col(c) + col("__rep").cast("long") * lit(s))
      }.drop("__rep")
    }

    def write(df: DataFrame, name: String): Unit = {
      df.repartition(fanout)
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[biggen] wrote $name")
    }

    val customer = src("customer"); val orders = src("orders")
    val lineitem = src("lineitem"); val part = src("part")
    val supplier = src("supplier")
    val cStride = stride(customer, "c_custkey")
    val oStride = stride(orders, "o_orderkey")
    val pStride = stride(part, "p_partkey")
    val sStride = stride(supplier, "s_suppkey")

    write(replicate(customer, bigFactor, Map("c_custkey" -> cStride)), "customer")
    write(replicate(supplier, bigFactor, Map("s_suppkey" -> sStride)), "supplier")
    write(replicate(part, bigFactor, Map("p_partkey" -> pStride)), "part")
    write(replicate(orders, bigFactor,
      Map("o_orderkey" -> oStride, "o_custkey" -> cStride)), "orders")
    write(replicate(lineitem, bigFactor,
      Map("l_orderkey" -> oStride, "l_partkey" -> pStride,
          "l_suppkey" -> sStride)), "lineitem")

    // small dims: copy unshifted (every replica joins the same 25/5 rows)
    write(src("nation"), "nation")
    write(src("region"), "region")

    val events = src("events")
    write(replicate(events, corpusFactor,
      Map("event_id" -> stride(events, "event_id"),
          "user_id" -> stride(events, "user_id"))), "events")

    val documents = src("documents")
    write(replicate(documents, corpusFactor,
      Map("doc_id" -> stride(documents, "doc_id"))), "documents")

    val embeddings = src("embeddings")
    val vStride = stride(embeddings, "vec_id")
    val emb = embeddings
      .withColumn("__rep", explode(sequence(lit(0), lit(corpusFactor - 1))))
      .withColumn("vec_id", col("vec_id") + col("__rep").cast("long") * lit(vStride))
      // de-tie the replicas: shift component 0 by i/1000 (cosine moves
      // ~1e-4 — inside near-dup thresholds, outside output rounding)
      .withColumn("embedding", concat(
        array((element_at(col("embedding"), 1)
          + col("__rep").cast("float") / lit(1000.0f)).cast("float")),
        slice(col("embedding"), 2, 1000000)))
      .drop("__rep")
    write(emb, "embeddings")

    spark.stop()
  }
}

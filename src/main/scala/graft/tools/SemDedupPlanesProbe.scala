package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probe for the AUTO-SCALED SemDeDup plane count
  * (`QueriesExt5.semDedupPlanes`): measures per-bucket pair work —
  * Σ_buckets c·(c−1)/2, the number of cosine evaluations the
  * within-bucket quadratic performs — at growing corpus breadth under
  * the ×84 replica profile (BigGen's shape: each base vector
  * replicated with a tiny embedding[0] perturbation, so replicas are
  * true near-dups that share buckets BY CONSTRUCTION).
  *
  * The decomposition the writeup needs: pair work splits into
  *  - the IRREDUCIBLE term — pairs within one base vector's replica
  *    group (≈ breadth · base · C(84,2)); these pairs ARE the answer
  *    (they score ≥ the threshold), no bucketing can skip them;
  *  - the OVERHEAD term — cross-group pairs sharing a bucket by
  *    hash collision; this is what plane growth must bound.
  *
  * Expected: at fixed planes=6 the overhead grows ~quadratically with
  * breadth (buckets saturate); with planes(n) ∝ log n the
  * overhead-per-row stays bounded.
  *
  * Usage: runMain graft.tools.SemDedupPlanesProbe [replicas] [breadths]
  */
object SemDedupPlanesProbe {
  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.map(_.toInt).getOrElse(84)
    val breadths = args.lift(1).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(1, 4, 16))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint(true)
    val nBase = base.count()

    def corpus(breadth: Int): DataFrame = {
      // breadth: a GENUINELY different vector per copy (deterministic
      // all-dims jitter — real corpus growth adds new content, not a
      // one-dim shift); replicas: BigGen's +i/1000 near-dup
      // perturbation on dim 0 only
      val b = spark.range(breadth).select(col("id").as("b"))
      val r = spark.range(replicas).select(col("id").as("r"))
      base.crossJoin(b).crossJoin(r)
        .select(
          (col("vec_id") * breadth * replicas +
            col("b") * replicas + col("r")).as("vec_id"),
          col("vec_id").as("base_id"), col("b"),
          expr("""transform(embedding, (x, j) ->
            CAST(x + sin((vec_id * 997 + b * 131) * 64 + j) * 0.6
                   + CASE WHEN j = 0 THEN r / 1000.0 ELSE 0.0 END AS FLOAT))""")
            .as("embedding"))
    }

    println(s"# SemDeDup plane auto-scaling probe: base=$nBase vectors, " +
      s"x$replicas replica profile (BigGen shape), breadth in " +
      s"{${breadths.mkString(",")}}")
    println("# pairWork = sum over buckets of C(c,2); irreducible = " +
      "pairs inside one (base,breadth) replica group; overhead = rest")
    for (breadth <- breadths) {
      val c = corpus(breadth).localCheckpoint(true)
      val n = c.count()
      val auto = graft.QueriesExt5.semDedupPlanes(n)
      val irreducible = nBase * breadth * (replicas.toLong * (replicas - 1) / 2)
      for ((label, planes) <- Seq("fixed6" -> 6, s"auto$auto" -> auto)) {
        val dims = graft.similarity.Lsh.probeDims(c, "embedding")
        val pm = graft.similarity.Lsh.md5PlaneMatrixInt(planes, dims)
        val sizes = c.withColumn("bucket",
            graft.similarity.Lsh.md5QuantBucket(col("embedding"), pm))
          .groupBy("bucket").count()
          .agg(sum((col("count") * (col("count") - 1)).cast("long") / lit(2L))
            .cast("long").as("pairs"),
            count(lit(1)).as("nonEmptyBuckets"))
          .head()
        val pairs = sizes.getLong(0)
        val overheadPerRow = (pairs - irreducible).toDouble / n
        println(f"breadth=$breadth%-3d n=$n%8d planes=$planes%-2d ($label%-7s) " +
          f"pairWork=$pairs%12d irreducible=$irreducible%12d " +
          f"overhead/row=$overheadPerRow%10.1f buckets=${sizes.getLong(1)}%7d")
      }
    }
    spark.stop()
  }
}

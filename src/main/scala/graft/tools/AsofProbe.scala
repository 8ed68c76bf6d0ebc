package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Does removing the norm checkpoint (a) keep norms un-inlined
  * (computed below the Generate), and (b) let the planner broadcast? */
object AsofProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val blocks = 8
    val v = emb.select(col("vec_id").as("vid"), col("embedding").as("v"),
      VectorFunctions.l2Norm(col("embedding")).as("nrm"),
      pmod(xxhash64(col("vec_id")), lit(blocks)).cast("int").as("blk"))
    val left = v
      .withColumn("tj", explode(expr(s"sequence(blk, ${blocks - 1})")))
      .select(col("vid").as("id_a"), col("v").as("va"), col("nrm").as("na"),
        col("blk").as("ti"), col("tj"))
    val right = v
      .withColumn("ti", explode(expr("sequence(0, blk)")))
      .select(col("vid").as("id_b"), col("v").as("vb"), col("nrm").as("nb"),
        col("ti"), col("blk").as("tj"))
    val pairs = left.join(right, Seq("ti", "tj"))
      .filter(col("ti") =!= col("tj") || col("id_a") < col("id_b"))
      .withColumn("cosine",
        VectorFunctions.dotProduct(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= 0.25)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"), col("cosine"))
    pairs.count()
    val plan = pairs.queryExecution.executedPlan.toString
    println("JOIN TYPE: " + (if (plan.contains("BroadcastHashJoin")) "BROADCAST"
      else if (plan.contains("SortMergeJoin")) "SMJ" else "OTHER"))
    // norm must NOT be recomputed in the join/filter: no SQRT above the Generate
    val joinRegion = plan.split("Generate").head
    println("SQRT in join region: " + joinRegion.contains("SQRT"))
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime(); pairs.count()
      println(f"TIME no-ckpt run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val cur = graft.SparkEntry.queries("q_neardup_exact")
    cur(spark, dir).count()
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime(); cur(spark, dir).count()
      println(f"TIME current run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}

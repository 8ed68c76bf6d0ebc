package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fault-injection proof of the RELIABLE-checkpoint path in the
  * connected-components star rounds (`graft.dedup.checkpointDir`).
  *
  * The claim being tested (DupClusters.roundCheckpoint's scaladoc): the
  * default `localCheckpoint` stores each round's edge set as
  * NON-REPLICATED executor blocks — on a real cluster, losing an
  * executor mid-iteration loses blocks whose lineage was truncated, and
  * the job dies; pointing `graft.dedup.checkpointDir` at fault-tolerant
  * storage makes each round a reliable checkpoint that survives the
  * same loss.
  *
  * The probe makes that concrete IN-PROCESS: a saboteur thread
  * repeatedly drops every persisted RDD's blocks through the
  * BlockManagerMaster while the star rounds run — the local[n]
  * equivalent of killing the executor holding them.
  *
  *  - localCheckpoint + saboteur → the round chain dies with
  *    "Checkpoint block … not found" (truncated lineage, nothing to
  *    recompute from);
  *  - reliable checkpoint + the SAME saboteur → the loop completes,
  *    because every round reads its parent from checkpoint FILES, and
  *    the labeling equals the clean-run labeling bit-for-bit.
  *
  * Usage: runMain graft.tools.CheckpointFaultProbe [nChain] [extraEdges]
  */
object CheckpointFaultProbe {
  def main(args: Array[String]): Unit = {
    val nChain = args.headOption.map(_.toLong).getOrElse(2000000L)
    val extra = args.lift(1).map(_.toLong).getOrElse(500000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // chain 0-1-2-…-n (the adversarial diameter case the star rounds
    // exist for) plus pseudo-random long-range edges
    def edges: DataFrame =
      spark.range(nChain).select(col("id").as("a"), (col("id") + 1).as("b"))
        .union(spark.range(extra).select(
          (pmod(xxhash64(col("id")), lit(nChain))).as("a"),
          (pmod(xxhash64(col("id") + 7), lit(nChain))).as("b")))

    def runCC(): Long =
      graft.dedup.DupClusters
        .connectedComponents(edges, "a", "b", localEdgeThreshold = 0)
        .agg(count(lit(1)), sum(xxhash64(col("node"), col("component"))))
        .head().getLong(0)

    def cleanRunFingerprint(): (Long, Long) = {
      val r = graft.dedup.DupClusters
        .connectedComponents(edges, "a", "b", localEdgeThreshold = 0)
        .agg(count(lit(1)).as("n"),
          coalesce(bit_xor(xxhash64(col("node"), col("component"))), lit(0L)))
        .head()
      (r.getLong(0), r.getLong(1))
    }

    @volatile var sabotage = false
    @volatile var dropped = 0L
    val saboteur = new Thread(() => {
      val sc = spark.sparkContext
      while (sabotage) {
        // RDD.unpersist removes the blocks through the BlockManager —
        // for a locally-checkpointed RDD that IS its only copy, the
        // in-process equivalent of the executor holding them dying
        sc.getPersistentRDDs.values.foreach { rdd =>
          try { rdd.unpersist(blocking = false); dropped += 1 }
          catch { case _: Exception => }
        }
        Thread.sleep(150)
      }
    }, "block-saboteur")

    println(s"# Reliable-checkpoint fault probe: chain=$nChain extra=$extra, " +
      "saboteur drops every persisted RDD's blocks every 150 ms")

    // clean reference labeling (no saboteur, default local checkpoint)
    val clean = cleanRunFingerprint()
    println(s"clean run                      labels=(${clean._1}, ${clean._2})")

    // A: local checkpoint + saboteur → expected to DIE on lost blocks
    sabotage = true
    saboteur.start()
    val localOutcome =
      try {
        runCC()
        "COMPLETED (saboteur missed the window — rerun with a larger graph)"
      } catch {
        case e: Throwable =>
          val root = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
            .toSeq.last
          s"FAILED as expected: ${root.getClass.getSimpleName}: " +
            root.getMessage.take(100).replaceAll("\\s+", " ")
      }
    println(s"localCheckpoint + block loss   $localOutcome " +
      s"(saboteur unpersisted $dropped RDD block sets)")

    // B: reliable checkpoint + the SAME saboteur → must complete and
    // agree with the clean run
    val ckDir = java.nio.file.Files.createTempDirectory("cc_reliable").toString
    spark.conf.set("graft.dedup.checkpointDir", ckDir)
    dropped = 0
    val t0 = System.nanoTime()
    val reliable =
      try {
        val r = graft.dedup.DupClusters
          .connectedComponents(edges, "a", "b", localEdgeThreshold = 0)
          .agg(count(lit(1)).as("n"),
            coalesce(bit_xor(xxhash64(col("node"), col("component"))), lit(0L)))
          .head()
        val fp = (r.getLong(0), r.getLong(1))
        val ok = fp == clean
        f"COMPLETED in ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
          s"labels=(${fp._1}, ${fp._2}) " +
          (if (ok) "== clean run OK" else s"!= clean run ${clean} MISMATCH")
      } catch {
        case e: Throwable => s"FAILED: ${e.getMessage.take(150)}"
      } finally {
        sabotage = false
        spark.conf.unset("graft.dedup.checkpointDir")
      }
    // dropped≈0 here is itself the finding: the reliable path keeps NO
    // single-copy block state for the saboteur to destroy — each
    // round's data lives in checkpoint files
    println(s"reliableCheckpoint + block loss $reliable " +
      s"(saboteur found $dropped persisted RDDs to kill)")
    spark.stop()
  }
}

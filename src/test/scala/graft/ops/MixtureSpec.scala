package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Library-level invariants for ops/Mixture. The resample/epochs/
  * tokenBudget kernels are primarily gated by the DuckDB hash-match on
  * q_mixture_sample / q_mixture_epochs / q_token_budget (all three
  * SFs + 1.4 GiB); this spec covers what the queries can't see —
  * schema preservation, the diagnostics flag, and the sharded
  * training-order writer. */
class MixtureSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    (0L until 300L).map(i => (i, s"src${i % 3}", s"text $i"))
      .toDF("doc_id", "source", "text")
  }

  test("resample preserves the input schema; diagnostics adds weight/n_total") {
    val w = when(col("source") === "src0", 1).otherwise(2)
    val plain = Mixture.resample(docs, "source", "doc_id", w)
    assert(plain.columns.toSeq == Seq("doc_id", "source", "text"))
    val diag = Mixture.resample(docs, "source", "doc_id", w,
      keepDiagnostics = true)
    assert(diag.columns.toSeq ==
      Seq("doc_id", "source", "text", "weight", "n_total"))
    // weight-0/null sources are dropped entirely
    val zero = Mixture.resample(docs, "source", "doc_id",
      when(col("source") === "src0", 0).otherwise(1))
    assert(zero.filter(col("source") === "src0").count() == 0)
    assert(zero.count() > 0)
  }

  test("epochs appends a 1-based rep column and keeps every doc at least once") {
    val e = Mixture.epochs(docs, "doc_id",
      when(col("source") === "src0", 512L).otherwise(256L))
    assert(e.columns.toSeq == Seq("doc_id", "source", "text", "rep"))
    assert(e.groupBy("doc_id").count().filter(col("count") < 1).count() == 0)
    assert(e.agg(min("rep")).head.getLong(0) == 1L)
    // exactly 2 reps for the 2.0-epoch source, 1 for the rest
    assert(e.filter(col("source") === "src0").groupBy("doc_id").count()
      .filter(col("count") =!= 2).count() == 0)
  }

  test("writeShuffledShards: file-ordered replay IS the global md5 order") {
    val out = java.nio.file.Files.createTempDirectory("shards").toString + "/t"
    Mixture.writeShuffledShards(docs, "doc_id", out, numShards = 4)
    val back = spark.read.parquet(out)
    assert(back.count() == 300)
    assert(back.columns.toSeq == Seq("doc_id", "source", "text"))
    // replay: files in name order, rows in file order
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getAbsolutePath).sorted
    assert(files.length == 4)
    val replayed = files.flatMap { f =>
      spark.read.parquet(f).select("doc_id").collect().map(_.getLong(0))
    }.toSeq
    val want = docs
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(replayed == want, "sharded replay diverges from the global order")
  }
}

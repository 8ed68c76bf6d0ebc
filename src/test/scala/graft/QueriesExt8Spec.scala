package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Invariant checks for the corpus-reshaping batch (chunking, packing);
  * the DuckDB hash-match at sf0.01 is the primary gate. */
class QueriesExt8Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  test("chunk: count = ceil(len/stride), first full chunks are `width` tokens") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 80).map(i => s"t$i").mkString(" ")), // 80 toks
      (2L, "a b c"),                                   // shorter than width
      (3L, (1 to 24).map(i => s"x$i").mkString(" ")))  // exactly one stride
      .toDF("doc_id", "text")
    val got = QueriesExt8.chunk(docs, 32, 24)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        max(col("n_tokens")).as("max_tok"),
        sum(when(col("n_tokens") === 32, 1).otherwise(0)).as("n_full"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getInt(2), r.getLong(3))).toMap
    // 80 tokens: starts 1,25,49,73 -> 4 chunks, 3 full (73..80 = 8 toks)
    assert(got(1L) == ((4L, 32, 3L)), s"doc1 ${got(1L)}")
    // 3 tokens: one short chunk
    assert(got(2L) == ((1L, 3, 0L)), s"doc2 ${got(2L)}")
    // 24 tokens: starts 1 -> chunk of 24... and start 25 > len? sequence
    // stops at len, so starts are 1 only when len < 1+stride
    assert(got(3L) == ((1L, 24, 0L)), s"doc3 ${got(3L)}")
  }

  test("chunk covers every token: union of [st, st+width) spans [1, len]") {
    val rows = q("q_chunk").groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), sum("n_tokens").as("tok_sum"),
        min("n_tokens").as("min_tok"))
      .collect()
    // coverage: with stride 24 < width 32, consecutive windows overlap
    // by 8, so sum(n_tokens) >= doc length always; every chunk non-empty
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getInt(3) > 0,
        s"empty chunk for doc ${r.get(0)}")
    }
  }

  test("pack conserves tokens and bins are non-negative and start-monotone") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val total = docs.select(expr(
      "sum(size(filter(split(trim(lower(text)), '\\\\s+'), x -> x != '')))"))
      .head().getLong(0)
    val packed = QueriesExt8.pack(docs, 512)
    val packedTotal = packed.agg(sum("n_tokens")).head().getLong(0)
    assert(packedTotal == total,
      s"token conservation broken: $packedTotal != $total")
    assert(packed.filter(col("bin") < 0).count() == 0)
    // a doc larger than the budget must still land in exactly one bin
    val oneDoc = Seq(("s", 1L, ("w " * 2000).trim)).toDF("source", "doc_id", "text")
    val big = QueriesExt8.pack(oneDoc, 512).collect()
    assert(big.length == 1 && big(0).getAs[Long]("n_tokens") == 2000L)
  }

  test("pack: per-source window => no exchange besides source hash + final sort") {
    val p = q("q_pack").queryExecution.executedPlan.toString
    val nExch = "Exchange hashpartitioning".r.findAllIn(p).length
    // exactly ONE hash exchange: the window's source partitioning also
    // satisfies the (source, bin) groupBy (source ⊂ keys); the only
    // other exchange is the presentation range-sort
    assert(nExch == 1, s"expected one hash exchange, got $nExch:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"global serial pack leaked into plan:\n$p")
  }
}

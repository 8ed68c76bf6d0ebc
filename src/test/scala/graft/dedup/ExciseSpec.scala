package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact-substring excision (`Dedup.exciseDupSpans`, n-gram
  * approximation of Lee et al. ExactSubstr removal) on hand-built
  * docs where the expected cleaned text is known. n = 3 keeps the
  * fixtures readable. */
class ExciseSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String)], n: Int) = {
    import spark.implicits._
    Dedup.exciseDupSpans(rows.toDF("doc_id", "text"), "doc_id", "text", n)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
  }

  test("a substring shared by two docs is excised from both") {
    val out = run(Seq(
      (1L, "alpha beta gamma delta unique one"),
      (2L, "other words alpha beta gamma delta trailing")), n = 3)
    // duplicated 3-grams cover "alpha beta gamma delta" in both docs
    assert(out(1L) == ((6L, 4L, "unique one")))
    assert(out(2L) == ((7L, 4L, "other words trailing")))
  }

  test("a doc with no duplicated grams is untouched; short docs pass through") {
    val out = run(Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "entirely different words here now"),
      (3L, "tiny")), n = 3)
    assert(out(1L) == ((5L, 0L, "the quick brown fox jumps")))
    assert(out(2L) == ((5L, 0L, "entirely different words here now")))
    assert(out(3L) == ((1L, 0L, "tiny")))
  }

  test("within-doc repetition counts as duplication (corpus semantics)") {
    // "a b c" occurs twice INSIDE one doc → both occurrences excised
    // even with no other doc; the separator "x" (position 3, covered by
    // no duplicated gram) survives
    val out = run(Seq((1L, "a b c x a b c")), n = 3)
    assert(out(1L) == ((7L, 6L, "x")))
  }

  test("fully-duplicated doc cleans to empty; empty text yields zero counts") {
    val out = run(Seq(
      (1L, "same exact text here"),
      (2L, "same exact text here"),
      (3L, "")), n = 3)
    assert(out(1L) == ((4L, 4L, "")))
    assert(out(2L) == ((4L, 4L, "")))
    assert(out(3L) == ((0L, 0L, "")))
  }
}

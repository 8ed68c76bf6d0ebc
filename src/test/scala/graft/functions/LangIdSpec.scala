package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the r16 single-pass langIdHeuristic against the pre-r16
  * four-tower formulation (one `size(filter(toks, …))` per language —
  * inlined here verbatim as the reference), on the adversarial edge
  * set (empty / whitespace-only / null text, ties across languages,
  * case folding, marker words at the edges) and row-for-row on the
  * sf0.001 corpus. A divergence would silently change q_lang_id. */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-r16 formulation, kept as the equivalence reference. */
  private def langIdOld(c: Column): Column = {
    val markers: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of", "is", "with"),
      "es" -> Seq("el", "la", "los", "que", "con"),
      "de" -> Seq("der", "die", "das", "und", "mit"),
      "fr" -> Seq("le", "les", "des", "est", "avec"))
    val toks = TextFunctions.tokens(lower(c))
    val scores = markers.map { case (langCode, words) =>
      val arr = array(words.map(lit): _*)
      struct(size(filter(toks, t => array_contains(arr, t))).as("score"),
             lit(langCode).as("lang"))
    }
    val best = array_max(array(scores: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  test("single-pass langIdHeuristic ≡ four-tower form on edge inputs") {
    val edge = Seq(
      "", " ", "\t\n", "zzz qqq",
      "the cat and the dog is here",
      "el que con la los", "der hund und die katze",
      "le chat est avec les chiens",
      // exact score ties: every language scores 1 → argmax tie-break
      // must agree between the two forms (struct ordering on lang)
      "the el der le", "THE EL DER LE",
      // markers at edges, repeated markers, mixed whitespace
      "the", " the ", "the the the", "und\tmit\nder",
      "is with of and the que").toDF("text")
    val withNull = edge.union(
      spark.sql("SELECT CAST(NULL AS STRING) AS text"))
    val bad = withNull.select(
        TextFunctions.langIdHeuristic(col("text")).as("now"),
        langIdOld(col("text")).as("old"), col("text"))
      .filter(!(col("now") <=> col("old"))).collect()
    assert(bad.isEmpty, s"divergent lang ids: ${bad.mkString("; ")}")
  }

  test("single-pass langIdHeuristic ≡ four-tower form on the corpus") {
    val docs = graft.QueriesCommon.table(
      spark, "/root/testdata/sf0.001", "documents")
    val n = docs.filter(!(TextFunctions.langIdHeuristic(col("text")) <=>
      langIdOld(col("text")))).count()
    assert(n == 0)
  }
}

package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared query-building blocks. */
object QueriesCommon {
  /** The ONE tokenizing expression the text queries share — the Spark
    * twin of the oracle SQL's `regexp_split_to_array(trim(lower(text)),
    * '\s+')`-with-empty-guard construction (and of
    * `Dedup.wordTokens`). Single-sourced so a tokenization change
    * can't silently diverge one query from its oracle. */
  def toksSqlFor(textCol: String): String =
    s"filter(split(trim(lower($textCol)), '\\\\s+'), x -> x != '')"

  val toksSql: String = toksSqlFor("text")

  def toksExpr: Column = expr(toksSql)

  /** (doc_id, toks) projection over a documents-shaped frame. */
  def tokens(d: DataFrame): DataFrame =
    d.select(col("doc_id"), toksExpr.as("toks"))
}

package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge.
  *
  * Spark 4 moved the conversion helpers behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); a library adding
  * native Catalyst expressions still needs them to expose a typed
  * Column API. This object lives inside the `org.apache.spark.sql`
  * package solely to re-export those two calls — no other internals
  * are touched. */
object Bridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}

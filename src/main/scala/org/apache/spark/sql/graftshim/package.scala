package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst expressions and the public
  * Column API. Spark 4 moved Column<->Expression conversion behind
  * `private[sql]` (org.apache.spark.sql.classic.ExpressionUtils), so
  * extension libraries expose it from inside the package — the same
  * technique Spark-native connector/extension projects use.
  */
package object graftshim {
  def exprToColumn(e: Expression): Column = ExpressionUtils.column(e)
  def columnToExpr(c: Column): Expression = ExpressionUtils.expression(c)

  /** Unload every loaded state-store provider (`private[sql]` in
    * Spark 4). A streaming harness that runs hundreds of queries
    * against throwaway checkpoints must drop their providers itself —
    * see EventStream.unloadStateStores for the measured leak.
    */
  def unloadAllStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()
}

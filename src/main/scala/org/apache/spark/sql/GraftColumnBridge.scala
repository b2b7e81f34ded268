package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark 4's `private[sql]` Column↔Expression
  * converters, so graft's custom Catalyst expressions can expose
  * `Column`-level entry points. Standard practice for Spark extension
  * libraries (the Column API hides Expression behind ColumnNode in 4.x).
  */
object GraftColumnBridge {
  def toExpression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Release the block-manager storage behind a `localCheckpoint`ed
    * Dataset. `Dataset.unpersist` only touches the plan cache, not the
    * checkpoint RDD, so iterative algorithms that checkpoint per round
    * (connected components) would otherwise strand O(rounds) cached
    * blocks until GC + ContextCleaner notice. Finds the `LogicalRDD`
    * leaves (what localCheckpoint rewrites the plan to) and unpersists
    * their RDDs directly; non-blocking, safe on non-checkpointed plans
    * (no-op).
    */
  def unpersistCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}

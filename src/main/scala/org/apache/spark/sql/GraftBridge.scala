package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ↔ Expression conversions, so
  * graft's native Catalyst expressions (`graft.functions.FloatVecDot`, …)
  * can be exposed through the public `Column` API. Standard pattern for
  * Spark extension libraries; no Spark internals are modified.
  */
object GraftBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** Wrap a single-row, single-column DataFrame as a scalar-subquery
    * expression — the form `BloomFilterMightContain` (and any other
    * runtime-filter-style probe) requires for its build side: the
    * subquery executes once and its value is broadcast into the probe
    * expression, never re-evaluated per row. */
  def scalarSubquery(df: DataFrame): Expression =
    catalyst.expressions.ScalarSubquery(
      df.queryExecution.analyzed,
      Nil, catalyst.expressions.NamedExpression.newExprId, Nil, None, None, None)

  /** Non-blocking read of an [[Observation]]'s metrics (`getOrEmpty` is
    * `private[sql]`): empty map until the observed action's listener has
    * fired. Lets an iterative loop poll a metric that rides an eager
    * checkpoint's job instead of paying a separate count job per round,
    * with a bounded wait and an explicit fallback on the caller's side. */
  def observationGetOrEmpty(o: Observation): Map[String, Any] =
    o.getOrEmpty

  /** Bounded-wait read of one long metric off an [[Observation]] whose
    * action (an eager localCheckpoint, typically) has already run: polls
    * ~1 s for the async listener, then falls back to the caller's
    * recompute so a missed metric degrades to the old extra job, never to
    * a wrong value. */
  def observedLong(o: Observation, key: String)(fallback: => Long): Long = {
    var polls = 0
    var got = o.getOrEmpty
    while (got.isEmpty && polls < 100) {
      Thread.sleep(10); got = o.getOrEmpty; polls += 1
    }
    got.get(key).map(_.asInstanceOf[Long]).getOrElse(fallback)
  }

  /** Bounded-wait read of ALL metrics off an [[Observation]] whose action
    * (an eager localCheckpoint, typically) has already run — the
    * multi-metric sibling of [[observedLong]] for observations that mix
    * longs and collected sets. Returns the empty map if the listener
    * never fires; callers fall back to a recompute. */
  def observedMap(o: Observation): Map[String, Any] = {
    var polls = 0
    var got = o.getOrEmpty
    while (got.isEmpty && polls < 100) {
      Thread.sleep(10); got = o.getOrEmpty; polls += 1
    }
    got
  }

  /** Unpersist the RDD behind a `localCheckpoint()`ed DataFrame. Iterative
    * algorithms (connected components) checkpoint each round; without this
    * the superseded rounds' blocks stay pinned until the session ends.
    */
  def unpersistLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }.foreach(_.unpersist(blocking = false))
}

package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Plan-SHAPE pins for the round-14 performance wins: the correctness
  * oracles prove the RESULTS, the ×100 drill proves the TIMES, but
  * neither stops a future refactor (or a Catalyst planning flip) from
  * silently reintroducing the exact physical shapes these rewrites
  * removed. Each test asserts on the EXECUTED plan string — the same
  * evidence `.explain` gives a human — for the properties the round's
  * bisections identified as load-bearing:
  *
  *  - jaccard verify joins must be hash joins, not sort-merge: SMJ sorted
  *    8.1M candidate rows each carrying a full gram array (the measured
  *    ~63 s dominant term of the ×100 drill before the shuffle_hash hint).
  *  - winnow fingerprinting must stay window-free: the old plan exploded
  *    one row per character position through a doc-keyed WindowExec
  *    (exchange + sort of the whole corpus's positions — the dominant
  *    term of the 159 s ×100 winnow).
  *  - corpus_diff must shuffle fingerprint projections, never text: the
  *    100 TB posture claimed in its scaladoc, checked against the
  *    exchange inputs actually planned.
  */
class PlanShapeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def executed(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("jaccard verify stage plans hash joins, never a sort-merge over array rows") {
    val plan = executed(operators.Dedup.dedupNgramJaccard(spark, sf))
    assert(plan.contains("ShuffledHashJoin") || plan.contains("BroadcastHashJoin"),
      s"verify joins lost their hash-join shape:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "a SortMergeJoin reappeared in the jaccard plan — it sorts " +
        "candidate rows carrying full gram arrays, the measured dominant " +
        "cost the shuffle_hash hints removed")
  }

  test("winnow fingerprinting plans no window operator and no per-position explode") {
    // winnowFingerprints alone (the shared front half): the per-row
    // sliding-minima form must keep WindowExec out of the plan
    val fp = operators.Dedup.winnowFingerprints(
      Tables.documents(spark, sf).select("doc_id", "text"))
    val plan = executed(fp)
    assert(!plan.contains("Window"),
      s"winnow fingerprints re-acquired a window operator (the doc-keyed " +
        s"exchange+sort over per-position rows):\n$plan")
  }

  test("corpus_diff exchanges carry fingerprints, never document text") {
    val df = operators.DataQuality.corpusDiff(spark, sf)
    df.count() // finalize: AQE hides the physical tree until execution
    // every shuffle input's schema must be the (id, source, 32-char fp)
    // projection — the `text` column must be projected away BELOW the
    // exchange, not carried through it
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val top = df.queryExecution.executedPlan
    val finalPlan = top.collectFirst {
      case a: AdaptiveSparkPlanExec => a.executedPlan
    }.getOrElse(top)
    val exchanges = finalPlan.collectWithSubqueries {
      case e: ShuffleExchangeLike => e }
    assert(exchanges.nonEmpty, s"expected at least one exchange:\n$finalPlan")
    exchanges.foreach { e =>
      val cols = e.child.output.map(_.name)
      assert(!cols.contains("text"),
        s"an exchange carries raw document text: $cols")
    }
  }
}

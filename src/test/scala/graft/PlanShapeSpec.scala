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

  test("winnow pair stage plans no join operator (posting-list pair generation)") {
    // the r15 rewrite: candidate pairs are emitted in-row from sorted
    // posting lists — the whole dedup_winnow plan is scan → aggregate →
    // generate → aggregate, with NO join anywhere (the old plan's
    // fp-keyed equi-self-join re-shuffled the ~40-per-doc fingerprint
    // explode twice, the measured dominant exchange at ×300)
    val df = operators.Dedup.dedupWinnow(spark, sf)
    df.count() // finalize AQE
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val top = df.queryExecution.executedPlan
    val finalPlan = top.collectFirst {
      case a: AdaptiveSparkPlanExec => a.executedPlan
    }.getOrElse(top)
    val joins = finalPlan.collectWithSubqueries { case j: BaseJoinExec => j }
    assert(joins.isEmpty,
      s"a join reappeared in the winnow pair stage:\n$finalPlan")
  }

  test("winnow posting collect partial-aggregates map-side (capped UDAF keeps the shape)") {
    // the r16 capped collect must still be a two-phase aggregate: a
    // partial (map-side) pass before the fp-keyed exchange and a merge
    // after — a UDAF that silently planned as a single-phase
    // SortAggregate-after-shuffle would re-concentrate every hot
    // posting's rows on one reducer before the buffer could cap them
    val df = operators.Dedup.dedupWinnow(spark, sf)
    df.count() // finalize AQE
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.aggregate.{ObjectHashAggregateExec, SortAggregateExec}
    val top = df.queryExecution.executedPlan
    val finalPlan = top.collectFirst {
      case a: AdaptiveSparkPlanExec => a.executedPlan
    }.getOrElse(top)
    val objAggs = finalPlan.collectWithSubqueries { case o: ObjectHashAggregateExec => o }
    assert(objAggs.size >= 2,
      s"expected partial+final ObjectHashAggregate pair for the capped collect:\n$finalPlan")
    val partials = objAggs.filter(_.aggregateExpressions.exists(_.mode ==
      org.apache.spark.sql.catalyst.expressions.aggregate.Partial))
    assert(partials.nonEmpty,
      s"capped collect lost its map-side partial phase:\n$finalPlan")
  }

  test("edit-distance histogram prefilter sits below the pair-distinct exchange") {
    // the packed-counter L1 filter must run on the raw block-join output,
    // BEFORE the distinct's exchange — filtering after it would re-admit
    // the shared-prefix pair mass (777M rows at ×100) into the shuffle
    // the filter exists to shrink. In the plan: the partial
    // HashAggregate → Exchange(name_a, name_b) → final HashAggregate
    // distinct, with the sa1/sb1 L1 condition strictly below the exchange.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.FilterExec
    val names = Tables.part(spark, sf)
      .select(org.apache.spark.sql.functions.col("p_name").as("name")).distinct()
    val cands = operators.TextAnalysis.editDistanceCandidates(names)
    cands.count() // finalize AQE
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val top = cands.queryExecution.executedPlan
    val finalPlan = top.collectFirst {
      case a: AdaptiveSparkPlanExec => a.executedPlan
    }.getOrElse(top)
    // Catalyst folds the L1 predicate into the block join's own
    // condition when it can (better still — pairs die at join time);
    // accept it as a FilterExec OR a join-condition residual
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    // both packed-signature columns must appear in the one condition —
    // a lone "sa1" substring could false-positive on any future column
    // containing it (ADVICE r14)
    def isL1Cond(c: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
      val s = c.toString; s.contains("sa1") && s.contains("sb1")
    }
    def hasL1Filter(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.collectWithSubqueries {
        case f: FilterExec if isL1Cond(f.condition) => f
        case j: BaseJoinExec if j.condition.exists(isL1Cond) => j
      }.nonEmpty
    assert(hasL1Filter(finalPlan), s"histogram L1 filter vanished:\n$finalPlan")
    // the filter must NOT be above any pair-key exchange: every exchange
    // whose subtree contains the L1 filter proves the filter ran first
    val pairExchanges = finalPlan.collectWithSubqueries {
      case e: ShuffleExchangeLike
        if e.child.output.map(_.name).contains("name_a") &&
           e.child.output.map(_.name).contains("name_b") => e
    }
    assert(pairExchanges.nonEmpty, s"expected the distinct exchange:\n$finalPlan")
    pairExchanges.foreach { e =>
      assert(hasL1Filter(e.child),
        s"a pair exchange runs BEFORE the histogram filter — the " +
          s"shared-prefix mass is back in the shuffle:\n$e")
    }
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

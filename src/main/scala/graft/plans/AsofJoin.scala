package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, TimestampType}

/** Native as-of join — the whole-operator custom path (SURVEY.md §7.3
  * preference (c): logical marker → planner `Strategy` → `SparkPlan`),
  * exercised by the one operator Spark genuinely lacks: "for each left row,
  * the LATEST right row with the same key and `rightTime <= leftTime`".
  *
  * The composed alternative (`TemporalJoins.asofLatestPrior`) unions both
  * relations and runs a running-max window over the combined stream — it
  * scales, but it pushes left+right through one sort and needs the two
  * sides to share a schema. The native operator keeps the relations
  * separate: each side shuffles ONCE on its own key and sorts on
  * (key, time) — exactly a sort-merge join's cost — then a single forward
  * merge pass per partition emits one row per left row. No union
  * materialization, no window buffer, no row inflation on right-side
  * duplicates (an ordinary `rt <= lt` theta join would multiply left rows;
  * the merge keeps only the latest match). At 100 TB: two key-clustered
  * exchanges, linear merge, right side never rewinds — the plan a
  * first-class engine ships for this operator.
  */

/** Join-condition marker: `asof_le(leftTime, rightTime)` selects, per left
  * row, the latest right row with `rightTime <= leftTime`. Only meaningful
  * inside a LEFT OUTER join condition of the shape
  * `k1 = k2 AND asof_le(lt, rt)`, where [[AsofJoinStrategy]] plans it onto
  * [[AsofJoinExec]]. Deliberately `Unevaluable`: if the strategy is not
  * registered (or the condition shape doesn't match), planning the marker
  * as an ordinary predicate would silently produce one row per ≤-match —
  * wrong MULTIPLICITY, not just wrong values — so evaluation must be
  * impossible rather than plausible.
  */
case class AsofLE(leftTime: Expression, rightTime: Expression)
    extends BinaryExpression with Unevaluable with Predicate {
  override def left: Expression = leftTime
  override def right: Expression = rightTime
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "asof_le"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(leftTime = newLeft, rightTime = newRight)
}

/** Plans `Join(l, r, LeftOuter, k1 = k2 AND ... AND asof_le(lt, rt))` onto
  * [[AsofJoinExec]]. Every equi-conjunct is normalized so its left side
  * references only `l`; any conjunct that straddles sides non-equi (or a
  * second asof marker) makes the strategy decline — the Unevaluable marker
  * then fails the query loudly instead of running with wrong semantics.
  */
object AsofJoinStrategy extends SparkStrategy with PredicateHelper {

  private val timeTypes: Set[DataType] = Set(LongType, TimestampType)

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(l, r, LeftOuter, Some(cond), _)
        if cond.exists(_.isInstanceOf[AsofLE]) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val (asofs, rest) = conjuncts.partition(_.isInstanceOf[AsofLE])
      val keyPairs = rest.map {
        case EqualTo(a, b) if a.references.subsetOf(l.outputSet) &&
            b.references.subsetOf(r.outputSet) => Some((a, b))
        case EqualTo(a, b) if b.references.subsetOf(l.outputSet) &&
            a.references.subsetOf(r.outputSet) => Some((b, a))
        case _ => None
      }
      asofs match {
        case Seq(AsofLE(lt, rt))
            if keyPairs.nonEmpty && keyPairs.forall(_.isDefined) &&
              lt.references.subsetOf(l.outputSet) &&
              rt.references.subsetOf(r.outputSet) &&
              timeTypes.contains(lt.dataType) && lt.dataType == rt.dataType =>
          val (lk, rk) = keyPairs.flatten.unzip
          AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
        case _ => Nil
      }
    case _ => Nil
  }
}

/** Sort-merge backward as-of join. Children are key-clustered (one shuffle
  * each, co-partitioned by `EnsureRequirements` — the sort-merge-join
  * machinery) and sorted on (key, time); one forward pass per partition
  * joins each left row to the latest right row with `rtime <= ltime`, or
  * nulls. The right cursor only advances: per partition the work is
  * |left| + |right| row visits and one retained copy of the current
  * lookahead/candidate rows — no buffering of groups, no rewind, state
  * O(1) regardless of key skew.
  */
case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // projections/orderings are per-partition state (not thread-safe)
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val keyOrd: Ordering[InternalRow] =
        RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val lTimeBound = BindReferences.bindReference(leftTime, left.output)
      val rTimeBound = BindReferences.bindReference(rightTime, right.output)
      // both supported time types are longs internally (micros for
      // timestamps); a null time never matches (<= is ternary-false)
      def timeOf(bound: Expression, row: InternalRow): java.lang.Long = {
        val v = bound.eval(row)
        if (v == null) null else v.asInstanceOf[Long]
      }

      new Iterator[InternalRow] {
        private val joined = new JoinedRow
        private val nullRight = new GenericInternalRow(right.output.size)
        private val resultProj = UnsafeProjection.create(output, output)
        // lookahead: the next unconsumed right row (copied — the child
        // iterator reuses its row buffer)
        private var rRow: InternalRow = _
        private var rKey: InternalRow = _
        private var rTime: java.lang.Long = _
        advanceRight()
        // the latest right row seen with key == candidateKey (copied)
        private var candRow: InternalRow = _
        private var candKey: InternalRow = _

        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            val row = rIter.next().copy()
            rRow = row
            rKey = rKeyProj(row).copy()
            rTime = timeOf(rTimeBound, row)
          } else { rRow = null; rKey = null; rTime = null }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTime = timeOf(lTimeBound, l)
          // consume right rows that are behind-or-at this left position;
          // equal-key rows with rTime <= lTime become the newest candidate
          var continue = rRow != null
          while (continue) {
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) advanceRight()
            else if (c == 0 && rTime != null && lTime != null && rTime <= lTime) {
              candRow = rRow
              candKey = rKey
              advanceRight()
            } else continue = false
            if (rRow == null) continue = false
          }
          val matched = candRow != null && lTime != null &&
            keyOrd.compare(candKey, lKey) == 0
          resultProj(joined(l, if (matched) candRow else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Runtime registration for sessions not launched with
  * `spark.sql.extensions=graft.plans.GraftExtensions`: adds the strategy
  * through the public `experimental.extraStrategies` hook. Idempotent.
  */
object GraftStrategies {
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsofJoinStrategy
  }
}

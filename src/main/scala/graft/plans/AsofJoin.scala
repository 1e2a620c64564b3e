package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
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
  *
  * Condition-shape contract (declines fail loudly via the Unevaluable
  * marker, by design): every non-asof conjunct must be an equality with
  * one side referencing only the left relation and the other only the
  * right — i.e. a real cross-relation join key. Single-side predicates
  * (`t > 5`) and constant equalities (`k = 5`) are NOT accepted as keys
  * or residuals; filter each side *before* the join instead. NULL join
  * keys follow SQL `=` semantics: a null key matches nothing, so a
  * null-keyed left row gets the outer-join null match.
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
  *
  * Physical selection mirrors Spark's own `JoinSelection` posture (the
  * q5/q18 rule — thresholds and AQE, hints only where schema-bounded):
  * [[AsofBroadcastJoinExec]] is chosen when the right side carries an
  * explicit `broadcast()` hint (hint wins, as for equi joins) OR when its
  * plan-time size estimate sits under
  * `spark.sql.autoBroadcastJoinThreshold`; otherwise the sort-merge
  * [[AsofJoinExec]]. Either way the broadcast build is guarded by a
  * documented ROW budget (`graft.asof.maxBroadcastRows`, default 10M):
  * each task builds a hash index over the broadcast rows, so a
  * fact-scale side must fail loudly at build time — with a message naming
  * the budget and the fix FOR THE PATH THAT CHOSE IT (drop the hint vs.
  * lower the size threshold) — rather than OOM an executor. The
  * size-estimate path is additionally vetoed at planning time when the
  * right side's row-count statistic already exceeds the budget: a
  * dictionary/RLE-compressed table can sit under the byte threshold at
  * ~1 byte/row while holding far more rows than the index budget, and an
  * UNHINTED query must then keep the working merge plan, not trade it
  * for a guaranteed runtime failure.
  */
object AsofJoinStrategy extends SparkStrategy with PredicateHelper {

  /** Session conf key for the broadcast-build row budget (see above). */
  val MaxBroadcastRowsKey = "graft.asof.maxBroadcastRows"

  /** Default budget: 10M rows ≈ hundreds of MB of per-task index — past
    * this the merge exec's two shuffles are the cheaper, safer plan. */
  val MaxBroadcastRowsDefault = 10000000L

  private val timeTypes: Set[DataType] = Set(LongType, TimestampType)

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(l, r, LeftOuter, Some(cond), _)
        if cond.exists(_.isInstanceOf[AsofLE]) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val (asofs, rest) = conjuncts.partition(_.isInstanceOf[AsofLE])
      // both sides must actually reference their relation — an empty
      // reference set is a subset of anything, so without the nonEmpty
      // guard a constant conjunct like `k = 5` would become a "key" that
      // hash-clusters the whole right side onto one partition
      val keyPairs = rest.map {
        case EqualTo(a, b) if a.references.nonEmpty && b.references.nonEmpty &&
            a.references.subsetOf(l.outputSet) &&
            b.references.subsetOf(r.outputSet) => Some((a, b))
        case EqualTo(a, b) if a.references.nonEmpty && b.references.nonEmpty &&
            b.references.subsetOf(l.outputSet) &&
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
          val conf = org.apache.spark.sql.internal.SQLConf.get
          val hinted = plan.asInstanceOf[Join].hint.rightHint
            .exists(_.strategy.contains(BROADCAST))
          // the JoinSelection size rule: a non-negative estimate under the
          // threshold auto-selects broadcast, no hint needed
          val threshold = conf.autoBroadcastJoinThreshold
          val bySize = threshold > 0 && r.stats.sizeInBytes >= 0 &&
            r.stats.sizeInBytes <= threshold
          val budget = conf.getConfString(
            MaxBroadcastRowsKey, MaxBroadcastRowsDefault.toString).toLong
          // veto the size-estimate path when row stats already know the
          // side is over the index budget (hint still wins — the user
          // asked, and gets the loud hinted diagnosis if it's too big)
          val sizeOk = bySize && !r.stats.rowCount.exists(_ > budget)
          if (hinted || sizeOk)
            AsofBroadcastJoinExec(planLater(l), planLater(r), lk, rk, lt, rt,
              budget, hintedSelection = hinted) :: Nil
          else
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
  *
  * Tie semantics: the matched TIME is deterministic (the greatest
  * `rtime <= ltime`), but among right rows sharing that exact (key, time)
  * the surviving payload is unspecified — Spark's sort is not stable, and
  * the broadcast variant resolves the same tie by broadcast-collection
  * order, so the two execs may pick different tied rows. Callers needing
  * a deterministic payload under duplicate (key, time) must make the time
  * unique (e.g. a sequence-number low-order component) — the same
  * contract as DuckDB's ASOF JOIN.
  */
case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  // standard operator observability (SQL UI / executedPlan.metrics):
  // output rows always == left rows (as-of multiplicity contract);
  // matched counts how many found a right row vs the outer null match
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

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
    val numOutputRows = longMetric("numOutputRows")
    val numMatchedRows = longMetric("numMatchedRows")
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

        // skips right rows with any null key component: SQL `=` never
        // matches on NULL, so they can match no left row — and letting
        // them through would wrongly pair them with null-keyed left rows
        // (the natural row ordering compares null == null as equal).
        // The null check runs on the iterator's REUSED buffer; only
        // retained rows pay the copy, so a null-key-heavy right side
        // skips allocation-free.
        private def advanceRight(): Unit = {
          var done = false
          while (!done) {
            if (rIter.hasNext) {
              val row = rIter.next()
              val k = rKeyProj(row)
              if (!k.anyNull) {
                rRow = row.copy()
                rKey = k.copy()
                rTime = timeOf(rTimeBound, rRow)
                done = true
              }
            } else { rRow = null; rKey = null; rTime = null; done = true }
          }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          // a null-keyed left row matches nothing (SQL `=` semantics) —
          // emit the outer null match without touching the right cursor
          // (null keys sort first, so the cursor has not passed anything)
          if (lKey.anyNull) {
            numOutputRows += 1
            return resultProj(joined(l, nullRight))
          }
          val lTime = timeOf(lTimeBound, l)
          // consume right rows that are behind-or-at this left position;
          // equal-key rows with rTime <= lTime become the newest candidate.
          // Null right times sort FIRST under the required ascending order
          // and can never match any left row — skip them, or they would
          // block the cursor in front of this key's real rows (found by
          // the AsofJoinProps random interleavings, not the spec fixtures)
          var continue = rRow != null
          while (continue) {
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) advanceRight()
            else if (c == 0 && rTime == null) advanceRight()
            else if (c == 0 && lTime != null && rTime <= lTime) {
              candRow = rRow
              candKey = rKey
              advanceRight()
            } else continue = false
            if (rRow == null) continue = false
          }
          val matched = candRow != null && lTime != null &&
            keyOrd.compare(candKey, lKey) == 0
          numOutputRows += 1
          if (matched) numMatchedRows += 1
          resultProj(joined(l, if (matched) candRow else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Broadcast as-of join — the dimension-sized-right-side variant, chosen
  * by the strategy on an explicit `broadcast()` hint OR when the right
  * side's size estimate sits under `autoBroadcastJoinThreshold` (the
  * equi-join selection posture). The left side keeps its existing
  * partitioning — NO shuffle, no sort on either side: the broadcast rows
  * are indexed per task into a hash map of per-key time-sorted arrays
  * (O(|right| log |right|) per task — the `BroadcastHashJoinExec`
  * build-cost shape, fine precisely when the right side is
  * dimension-sized), and each left row does one hash probe + binary
  * search. At 100 TB this is the as-of analogue of "broadcast the small
  * dim": a quotes/config/rates table joins against the full fact stream
  * with zero fact movement.
  *
  * `maxBuildRows` (from `graft.asof.maxBroadcastRows` at planning time)
  * guards the build: a side that arrives bigger than the budget fails
  * the task with a diagnosis naming the budget and the fix, BEFORE the
  * per-task index allocates — loud failure, not an executor OOM
  * (`AsofJoinSpec` pins both error paths). `hintedSelection` records WHY
  * the planner chose broadcast, so the diagnosis names a fix that
  * exists: "remove the broadcast() hint" is useless advice on an
  * auto-selected plan whose size estimate misjudged the row count —
  * that path is told to lower/disable the size threshold instead.
  */
case class AsofBroadcastJoinExec(left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    maxBuildRows: Long = AsofJoinStrategy.MaxBroadcastRowsDefault,
    hintedSelection: Boolean = true)
    extends BinaryExecNode {

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()
    val numOutputRows = longMetric("numOutputRows")
    val numMatchedRows = longMetric("numMatchedRows")
    val budget = maxBuildRows
    left.execute().mapPartitions { lIter =>
      // budget guard BEFORE the index allocates: the broadcast itself is
      // already resident (Spark's exchange enforces its own 8 GB/512M-row
      // caps), but the per-task hash index roughly doubles that footprint
      // per running task — the thing that OOMs first on a mis-hinted side
      if (broadcastRows.value.length > budget) {
        val fix = if (hintedSelection)
          "remove the broadcast() hint (the sort-merge exec handles any size)"
        else
          "the spark.sql.autoBroadcastJoinThreshold size estimate misjudged " +
            "the row count — lower or disable (-1) the threshold for this " +
            "query so the sort-merge exec plans instead"
        throw new IllegalStateException(
          s"as-of broadcast build side has ${broadcastRows.value.length} rows, " +
            s"over the ${AsofJoinStrategy.MaxBroadcastRowsKey}=$budget budget: " +
            s"$fix, or raise the budget for a genuinely dimension-sized table")
      }
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val rTimeBound = BindReferences.bindReference(rightTime, right.output)
      // per-task index build: key -> (sorted times, rows in that order)
      val index = new java.util.HashMap[UnsafeRow, scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]]()
      broadcastRows.value.foreach { row =>
        val t = rTimeBound.eval(row)
        val k0 = rKeyProj(row)
        // a null right time can never satisfy rt <= lt, and a null key
        // component can never satisfy `=` (the UnsafeRow hash map would
        // otherwise match null keys byte-wise) — both stay out of the index
        if (t != null && !k0.anyNull) {
          val k = k0.copy()
          var buf = index.get(k)
          if (buf == null) {
            buf = scala.collection.mutable.ArrayBuffer.empty[(Long, InternalRow)]
            index.put(k, buf)
          }
          buf += ((t.asInstanceOf[Long], row))
        }
      }
      index.values().forEach { buf =>
        val sorted = buf.sortBy(_._1) // stable: equal times keep input order
        buf.clear(); buf ++= sorted; ()
      }

      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val lTimeBound = BindReferences.bindReference(leftTime, left.output)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(right.output.size)
      val resultProj = UnsafeProjection.create(output, output)

      lIter.map { l =>
        val lTimeV = lTimeBound.eval(l)
        val lk = lKeyProj(l)
        val matched: InternalRow =
          if (lTimeV == null || lk.anyNull) null // null time/key: no match
          else {
            val buf = index.get(lk)
            if (buf == null) null
            else {
              // rightmost entry with time <= lTime (ties inclusive, last wins)
              val lt = lTimeV.asInstanceOf[Long]
              var lo = 0
              var hi = buf.length // exclusive; invariant: buf(i)._1 <= lt for i < lo
              while (lo < hi) {
                val mid = (lo + hi) >>> 1
                if (buf(mid)._1 <= lt) lo = mid + 1 else hi = mid
              }
              if (lo == 0) null else buf(lo - 1)._2
            }
          }
        numOutputRows += 1
        if (matched != null) numMatchedRows += 1
        resultProj(joined(l, if (matched != null) matched else nullRight))
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

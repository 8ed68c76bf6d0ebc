package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.unsafe.types.UTF8String

/** As-of join as a first-class Catalyst operator — the SURVEY §7.3
  * tier-(c) path: a custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan`, for semantics the built-in operators can't express
  * without a shape change (`ops.AsofJoin.asofBackward` re-expresses it
  * via union+window; this node IS the operator).
  *
  * Why bother when the union-merge works: the physical node declares
  * its real requirements — children clustered on the key and sorted by
  * (key, time) — so the planner co-partitions both sides and the merge
  * itself is a streaming one-pass per partition holding ONE buffered
  * right row. No union row-blowup, no window frame state, and both
  * directions of partitioning reuse work: upstream, a child already
  * hash-partitioned on its key (e.g. `repartition(key)` feeding a
  * rollup) plans with NO as-of exchange at all; downstream, operators
  * see `outputOrdering`/`outputPartitioning` preserved (a following
  * groupBy on the key plans without another exchange). The window
  * formulation can promise neither — its union must re-shuffle on the
  * tag key regardless of how the inputs arrive.
  *
  * Semantics = `AsofJoin.asofBackward` (asserted equal in
  * AsofJoinNativeSpec): every left row + latest right row with equal
  * key and time <= (inclusive) / < (strict) the left time; right rows
  * must be unique per (key, time) for determinism.
  *
  * The merge loop compares keys/times through type-specialized
  * primitive comparators ([[AsofCmp]]) — no per-row boxing for the
  * long/int/date/timestamp keys that dominate event data; only
  * genuinely generic types (string, decimal) take the boxed path.
  */
final case class AsofJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    rightPayload: Seq[Attribute], inclusive: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ (rightTime +: rightPayload).map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Broadcast variant of [[AsofJoinNode]]: same semantics, but the right
  * side is declared dimension-sized, so the physical plan broadcasts it
  * and the left side flows through with NO shuffle and NO sort — the
  * 100 TB regime where the probe corpus is huge and the as-of table
  * (prices, config epochs, rollups) fits on every executor. */
final case class AsofJoinBroadcastNode(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    rightPayload: Seq[Attribute], inclusive: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ (rightTime +: rightPayload).map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsofJoinBroadcastNode =
    copy(left = newLeft, right = newRight)
}

/** Column comparator over InternalRows for the as-of merge, specialized
  * by data type so the hot loop never boxes: every integral-backed type
  * (long/int/short/byte, date, timestamp) compares as a primitive long;
  * only genuinely generic orderable types (string, decimal, double)
  * take the boxed `Comparable` path. Side A is the right (reference)
  * row, side B the left (probe) row; the snapshot slot retains B's
  * value across iterator steps (the sort exec reuses row buffers, so a
  * raw reference would go stale). */
private[plans] sealed trait AsofCmp {
  def cmpAB(a: InternalRow, ai: Int, b: InternalRow, bi: Int): Int
  def snapB(b: InternalRow, bi: Int): Unit
  def snapMatchesB(b: InternalRow, bi: Int): Boolean
  def clearSnap(): Unit
  def hasSnap: Boolean
}

private[plans] object AsofCmp {
  import org.apache.spark.sql.types._
  private def longGetter(dt: DataType): (InternalRow, Int) => Long = dt match {
    case LongType | TimestampType | TimestampNTZType => (r, i) => r.getLong(i)
    case IntegerType | DateType => (r, i) => r.getInt(i).toLong
    case ShortType => (r, i) => r.getShort(i).toLong
    case ByteType => (r, i) => r.getByte(i).toLong
    case _ => null
  }
  def apply(dtA: DataType, dtB: DataType): AsofCmp = {
    val ga = longGetter(dtA)
    val gb = longGetter(dtB)
    if (ga != null && gb != null) new LongAsofCmp(ga, gb)
    else new GenericAsofCmp(dtA, dtB)
  }
}

private[plans] final class LongAsofCmp(
    ga: (InternalRow, Int) => Long,
    gb: (InternalRow, Int) => Long) extends AsofCmp {
  private var snapSet = false
  private var snapV = 0L
  override def cmpAB(a: InternalRow, ai: Int, b: InternalRow, bi: Int): Int =
    java.lang.Long.compare(ga(a, ai), gb(b, bi))
  override def snapB(b: InternalRow, bi: Int): Unit = {
    snapV = gb(b, bi); snapSet = true
  }
  override def snapMatchesB(b: InternalRow, bi: Int): Boolean =
    snapSet && snapV == gb(b, bi)
  override def clearSnap(): Unit = snapSet = false
  override def hasSnap: Boolean = snapSet
}

private[plans] final class GenericAsofCmp(
    dtA: org.apache.spark.sql.types.DataType,
    dtB: org.apache.spark.sql.types.DataType) extends AsofCmp {
  private var snapSet = false
  private var snapV: Any = _
  override def cmpAB(a: InternalRow, ai: Int, b: InternalRow, bi: Int): Int =
    a.get(ai, dtA).asInstanceOf[Comparable[Any]].compareTo(b.get(bi, dtB))
  override def snapB(b: InternalRow, bi: Int): Unit = {
    snapV = b.get(bi, dtB) match {
      case s: UTF8String => s.clone()
      case x => x
    }
    snapSet = true
  }
  override def snapMatchesB(b: InternalRow, bi: Int): Boolean =
    snapSet && snapV.asInstanceOf[Comparable[Any]].compareTo(b.get(bi, dtB)) == 0
  override def clearSnap(): Unit = { snapSet = false; snapV = null }
  override def hasSnap: Boolean = snapSet
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lt, rt, pay, incl) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, pay, incl) :: Nil
    case AsofJoinBroadcastNode(l, r, lk, rk, lt, rt, pay, incl) =>
      AsofJoinBroadcastExec(planLater(l), planLater(r), lk, rk, lt, rt, pay, incl) :: Nil
    case _ => Nil
  }
}

/** As-of join elimination — the operator-aware optimizer rule a custom
  * node must bring along or it becomes an optimization BARRIER: a
  * backward as-of join emits exactly one output row per left row (a
  * left-outer point lookup), so when a parent consumes no right-side
  * column the join contributes nothing and the left child can stand in
  * for it. Catalyst does precisely this for its own cardinality-safe
  * joins (`EliminateOuterJoin`, left-semi pruning) and for windows
  * (`RemoveRedundantWindow`-style collapses) — e.g. `count(*)` over
  * the union+window as-of formulation optimizes all the way down to a
  * bare scan count; without this rule the same query through the
  * native node would execute both shuffles and the merge to count rows
  * the left side already determines. */
object AsofJoinEliminationRule
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Project}
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(_, n: AsofJoinNode)
        if p.references.subsetOf(n.left.outputSet) =>
      p.copy(child = n.left)
    case p @ Project(_, n: AsofJoinBroadcastNode)
        if p.references.subsetOf(n.left.outputSet) =>
      p.copy(child = n.left)
    case a @ Aggregate(_, _, n: AsofJoinNode, _)
        if a.references.subsetOf(n.left.outputSet) =>
      a.copy(child = n.left)
    case a @ Aggregate(_, _, n: AsofJoinBroadcastNode, _)
        if a.references.subsetOf(n.left.outputSet) =>
      a.copy(child = n.left)
  }
}

final case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    rightPayload: Seq[Attribute], inclusive: Boolean) extends BinaryExecNode {

  private def rightOut: Seq[Attribute] =
    (rightTime +: rightPayload).map(_.withNullability(true))
  override def output: Seq[Attribute] = left.output ++ rightOut

  /** Both children hash-clustered on their key: the planner inserts
    * co-partitioned exchanges exactly like a sort-merge join. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lkOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val ltOrd = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rkOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rtOrd = right.output.indexWhere(_.exprId == rightTime.exprId)
    require(lkOrd >= 0 && ltOrd >= 0 && rkOrd >= 0 && rtOrd >= 0,
      "as-of key/time attributes must come from the respective child")
    val (lkT, ltT, rkT, rtT) =
      (leftKey.dataType, leftTime.dataType, rightKey.dataType, rightTime.dataType)
    val rightProjExprs = rightTime +: rightPayload
    val rightSchema = right.output
    val leftSchema = left.output
    val outAttrs = output
    val nRight = rightProjExprs.length
    val incl = inclusive

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rightProj = UnsafeProjection.create(rightProjExprs, rightSchema)
      val outProj = UnsafeProjection.create(outAttrs, leftSchema ++ rightOut)
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      // A = right row, B = left row; the snapshot slot in keyCmp holds
      // the left key the carried match belongs to (primitive long for
      // integral keys — no per-row boxing anywhere in the loop).
      val keyCmp = AsofCmp(rkT, lkT)
      val timeCmp = AsofCmp(rtT, ltT)

      new Iterator[InternalRow] {
        private var rHead: InternalRow = _
        private var lastMatch: UnsafeRow = _
        private def advanceRight(): Unit =
          rHead = if (rIter.hasNext) rIter.next() else null
        advanceRight()

        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          if (l.isNullAt(lkOrd) || l.isNullAt(ltOrd)) {
            return outProj(joined(l, nullRight))
          }
          // left is sorted by key: when the key group changes, the
          // carried match from the previous group is dead
          if (keyCmp.hasSnap && !keyCmp.snapMatchesB(l, lkOrd)) {
            keyCmp.clearSnap(); lastMatch = null
          }
          // consume right rows with (key, time) at or before the left
          // row's; the latest consumed row with an equal key matches
          var scanning = true
          while (scanning && rHead != null) {
            if (rHead.isNullAt(rkOrd) || rHead.isNullAt(rtOrd)) advanceRight()
            else {
              val kc = keyCmp.cmpAB(rHead, rkOrd, l, lkOrd)
              if (kc < 0) advanceRight()
              else if (kc == 0) {
                val tc = timeCmp.cmpAB(rHead, rtOrd, l, ltOrd)
                if (tc < 0 || (incl && tc == 0)) {
                  lastMatch = rightProj(rHead).copy()
                  keyCmp.snapB(l, lkOrd)
                  advanceRight()
                } else scanning = false
              } else scanning = false
            }
          }
          val m = if (lastMatch != null && keyCmp.hasSnap) lastMatch else nullRight
          outProj(joined(l, m))
        }
      }
    }
  }
}

/** Physical broadcast as-of: right child is planned under
  * `BroadcastDistribution(IdentityBroadcastMode)` (the planner inserts a
  * `BroadcastExchange`, reused across stages and AQE-aware), and each
  * left partition probes a per-executor-cached `key -> rows sorted by
  * time` index with a binary search. Works on InternalRows end to end —
  * no external-Row encoder boundary — which measured ~6× faster than the
  * collect+mapPartitions formulation it replaces at sf0.1. */
final case class AsofJoinBroadcastExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    rightPayload: Seq[Attribute], inclusive: Boolean) extends BinaryExecNode {

  private def rightOut: Seq[Attribute] =
    (rightTime +: rightPayload).map(_.withNullability(true))
  override def output: Seq[Attribute] = left.output ++ rightOut

  /** Left side: anything (no shuffle, no sort). Right side: broadcast. */
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): AsofJoinBroadcastExec =
    copy(left = newLeft, right = newRight)

  @inline private def cmp(a: Any, b: Any): Int =
    a.asInstanceOf[Comparable[Any]].compareTo(b)

  override protected def doExecute(): RDD[InternalRow] = {
    val lkOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val ltOrd = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rkOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rtOrd = right.output.indexWhere(_.exprId == rightTime.exprId)
    require(lkOrd >= 0 && ltOrd >= 0 && rkOrd >= 0 && rtOrd >= 0,
      "as-of key/time attributes must come from the respective child")
    val (lkT, ltT, rkT, rtT) =
      (leftKey.dataType, leftTime.dataType, rightKey.dataType, rightTime.dataType)
    val rightProjExprs = rightTime +: rightPayload
    val rightSchema = right.output
    val leftSchema = left.output
    val outAttrs = output
    val nRight = rightProjExprs.length
    val incl = inclusive
    val bcast = right.executeBroadcast[Array[InternalRow]]()

    // Cache key includes THIS operator's plan id, not just the
    // broadcast id: ReuseExchange can hand the same broadcast to two
    // as-of nodes with different key/time/payload configurations (e.g.
    // the same dimension joined on effective vs expiry date), and a
    // broadcast-id-only key would serve the first node's index to the
    // second — silently wrong matches.
    val cacheKey = (bcast.id, id)
    left.execute().mapPartitions { lIter =>
      // built once per executor per (broadcast, operator)
      val lookup = AsofJoinBroadcastExec.indexFor(cacheKey, () => {
        val rightProj = UnsafeProjection.create(rightProjExprs, rightSchema)
        val grouped = new java.util.HashMap[Any, java.util.ArrayList[(Any, UnsafeRow)]]()
        bcast.value.foreach { r =>
          if (!r.isNullAt(rkOrd) && !r.isNullAt(rtOrd)) {
            val k = r.get(rkOrd, rkT)
            var l = grouped.get(k)
            if (l == null) { l = new java.util.ArrayList(); grouped.put(k, l) }
            l.add((r.get(rtOrd, rtT), rightProj(r).copy()))
          }
        }
        val out = new java.util.HashMap[Any, (Array[Any], Array[UnsafeRow])](
          grouped.size() * 2)
        grouped.forEach { (k, l) =>
          val arr = l.toArray(new Array[(Any, UnsafeRow)](l.size()))
          java.util.Arrays.sort(arr, (x: (Any, UnsafeRow), y: (Any, UnsafeRow)) =>
            cmp(x._1, y._1))
          out.put(k, (arr.map(_._1), arr.map(_._2)))
        }
        out
      })
      val outProj = UnsafeProjection.create(outAttrs, leftSchema ++ rightOut)
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      lIter.map { l =>
        var m: InternalRow = nullRight
        if (!l.isNullAt(lkOrd) && !l.isNullAt(ltOrd)) {
          val hit = lookup.get(l.get(lkOrd, lkT))
          if (hit != null) {
            val (times, rows) = hit
            val t = l.get(ltOrd, ltT)
            // rightmost index with times(i) <= t (or < t when strict)
            var lo = 0; var hi = times.length - 1; var ans = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              val c = cmp(times(mid), t)
              if (c < 0 || (incl && c == 0)) { ans = mid; lo = mid + 1 }
              else hi = mid - 1
            }
            if (ans >= 0) m = rows(ans)
          }
        }
        outProj(joined(l, m))
      }
    }
  }
}

object AsofJoinBroadcastExec {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int), java.util.HashMap[Any, (Array[Any], Array[UnsafeRow])]]()
  /** Per-executor index cache keyed by (broadcast id, plan id); bounded
    * so a long-lived session can't accumulate stale indexes. */
  private[plans] def indexFor(key: (Long, Int),
      build: () => java.util.HashMap[Any, (Array[Any], Array[UnsafeRow])])
      : java.util.HashMap[Any, (Array[Any], Array[UnsafeRow])] = {
    if (cache.size > 64) cache.clear()
    cache.computeIfAbsent(key, _ => build())
  }
}

/** DataFrame-level API over the native operator. */
object AsofJoinNative {

  /** Install the planner strategy and the elimination rule on the
    * session (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsofJoinStrategy
    val curOpt = spark.experimental.extraOptimizations
    if (!curOpt.contains(AsofJoinEliminationRule))
      spark.experimental.extraOptimizations = curOpt :+ AsofJoinEliminationRule
  }

  /** Backward as-of join via the custom operator; same contract as
    * `ops.AsofJoin.asofBackward`. Key and time types must be orderable
    * atomic types (long/int/date/timestamp/string/decimal). */
  def asof(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      inclusive: Boolean = true): DataFrame =
    build(left, right, leftKey, rightKey, leftTime, rightTime, inclusive,
      broadcast = false)

  /** Backward as-of join with a broadcast (dimension-sized) right side:
    * zero shuffle and zero sort on the left. Same semantics as `asof`. */
  def asofBroadcast(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      inclusive: Boolean = true): DataFrame =
    build(left, right, leftKey, rightKey, leftTime, rightTime, inclusive,
      broadcast = true)

  private def build(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      inclusive: Boolean, broadcast: Boolean): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val lPlan = left.queryExecution.analyzed
    // Re-alias every right column: the aliases mint fresh exprIds at
    // the top of the right subtree, so when left and right share
    // lineage (self as-of), the analyzer's DeduplicateRelations
    // re-instances only attributes BELOW the aliases — the ones this
    // node captures stay valid.
    val rPlan = right
      .select(right.columns.map(c =>
        org.apache.spark.sql.functions.col(c).as(c)): _*)
      .queryExecution.analyzed
    val resolver = spark.sessionState.conf.resolver
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(a => resolver(a.name, name)).getOrElse(
        throw new IllegalArgumentException(s"no column $name"))
    val rKeyAttr = attr(rPlan, rightKey)
    val rTimeAttr = attr(rPlan, rightTime)
    val payload = rPlan.output.filterNot(a =>
      a.exprId == rKeyAttr.exprId || a.exprId == rTimeAttr.exprId)
    val node =
      if (broadcast)
        AsofJoinBroadcastNode(lPlan, rPlan,
          attr(lPlan, leftKey), rKeyAttr,
          attr(lPlan, leftTime), rTimeAttr, payload, inclusive)
      else
        AsofJoinNode(lPlan, rPlan,
          attr(lPlan, leftKey), rKeyAttr,
          attr(lPlan, leftTime), rTimeAttr, payload, inclusive)
    org.apache.spark.sql.graftbridge.Bridge.ofRows(spark, node)
  }
}

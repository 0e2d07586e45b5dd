package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF join as a first-class operator (SURVEY.md §2.3 / §4): for every
  * left row, attach the LATEST right row with the same key and
  * right-time ≤ left-time.
  *
  * This is the full custom-operator ladder (the (c) rung of the design
  * rule): logical node → planner Strategy → physical exec, injectable via
  * SparkSessionExtensions. The physical algorithm is a single merge-scan
  * over co-partitioned, (key, time)-sorted children — O(n) per partition
  * with O(1) state, versus the window rewrite's full shuffle + running-max
  * (ops.RelationalOps `join_asof` keeps that form as the composed-builtins
  * baseline; both are verified against the same oracle).
  *
  * 100 TB: both children hash-cluster on the join key with a pinned
  * partition count (pinning keeps the two shuffles zip-compatible under
  * AQE); per-partition state is one buffered right row — no spill surface.
  * Key/time expressions must evaluate to LongType-comparable values
  * (timestamps are micros-longs internally). */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  // Fail at construction (≈ analysis time), not mid-job with a
  // ClassCastException: the merge-scan evaluates keys/times as raw longs.
  AsOfJoinPlan.checkType("key", leftKey, AsOfJoinPlan.keyTypes)
  AsOfJoinPlan.checkType("key", rightKey, AsOfJoinPlan.keyTypes)
  AsOfJoinPlan.checkType("time", leftTime, AsOfJoinPlan.timeTypes)
  AsOfJoinPlan.checkType("time", rightTime, AsOfJoinPlan.timeTypes)

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): LogicalPlan =
    copy(left = l, right = r)
}

object AsOfJoinPlan {
  import org.apache.spark.sql.types._
  private[plans] val keyTypes: Set[DataType] = Set(LongType)
  private[plans] val timeTypes: Set[DataType] =
    Set(LongType, TimestampType, TimestampNTZType) // all micros-longs internally
  private def checkType(what: String, e: Expression, ok: Set[DataType]): Unit =
    require(ok.contains(e.dataType),
      s"as-of join $what must be ${ok.mkString(" or ")} (long-backed); " +
        s"got ${e.dataType} from $e")
}

/** Public API: `AsOf.join(purchases, clicks, "user_id", "c_user", "ts",
  * "c_ts")` — column names resolve against each side's analyzed output, so
  * callers never touch Expressions. */
object AsOf {
  def join(left: org.apache.spark.sql.DataFrame, right: org.apache.spark.sql.DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): org.apache.spark.sql.DataFrame = {
    val spark = left.sparkSession
    register(spark)
    def attr(df: org.apache.spark.sql.DataFrame, name: String): Expression =
      df.queryExecution.analyzed.output.find(_.name == name)
        .getOrElse(throw new IllegalArgumentException(s"no column $name"))
    val plan = AsOfJoinPlan(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      attr(left, leftKey), attr(right, rightKey),
      attr(left, leftTime), attr(right, rightTime))
    org.apache.spark.sql.GraftBridge.ofRows(spark, plan)
  }

  /** Idempotent strategy injection for sessions not built with
    * GraftExtensions. */
  def register(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // Pin the partition count so the two ENSURE_REQUIREMENTS shuffles stay
  // zip-compatible (AQE must not coalesce the sides differently).
  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey),
      requiredNumPartitions = Some(conf.numShufflePartitions)),
    ClusteredDistribution(Seq(rightKey),
      requiredNumPartitions = Some(conf.numShufflePartitions)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltB = BindReferences.bindReference(leftTime, left.output)
    val rkB = BindReferences.bindReference(rightKey, right.output)
    val rtB = BindReferences.bindReference(rightTime, right.output)
    val rightWidth = right.output.size
    val schema = output
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val toUnsafe = UnsafeProjection.create(schema, schema)
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      new Iterator[InternalRow] {
        private var pendingRight: InternalRow = null
        private var lastMatch: InternalRow = null
        private var lastMatchKey: Long = 0L

        /** Consume right rows ≤ (key, time); remember the latest same-key.
          * Null-keyed/timed right rows are discarded — a null never equals
          * any key (SQL join semantics), and because Spark sorts nulls
          * FIRST they all arrive before real keys, so skipping them keeps
          * the sorted-merge invariant intact. */
        private def advance(k: Long, t: Long): Unit = {
          var done = false
          while (!done && (pendingRight != null || ri.hasNext)) {
            if (pendingRight == null) pendingRight = ri.next()
            val rkv = rkB.eval(pendingRight)
            val rtv = rtB.eval(pendingRight)
            if (rkv == null || rtv == null) pendingRight = null
            else {
              val rk = rkv.asInstanceOf[Long]
              val rt = rtv.asInstanceOf[Long]
              if (rk < k || (rk == k && rt <= t)) {
                if (rk == k) { lastMatch = pendingRight.copy(); lastMatchKey = rk }
                pendingRight = null
              } else done = true
            }
          }
        }

        override def hasNext: Boolean = li.hasNext
        override def next(): InternalRow = {
          val l = li.next()
          val kv = lkB.eval(l)
          val tv = ltB.eval(l)
          if (kv == null || tv == null) toUnsafe(joined(l, nullRight))
          else {
            val k = kv.asInstanceOf[Long]
            val t = tv.asInstanceOf[Long]
            advance(k, t)
            val r = if (lastMatch != null && lastMatchKey == k) lastMatch else nullRight
            toUnsafe(joined(l, r))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)
}

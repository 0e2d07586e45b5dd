package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd stable string hash (SURVEY.md §2.9 `udf_expr_hash`): polynomial
  * rolling hash over the UTF-8 bytes, h ← (h·131 + byte) mod 1e9+7.
  *
  * Chosen over a "real" 64-bit hash because the modulus keeps every
  * intermediate in int64 — which makes the function expressible in ANSI SQL
  * (see textsql.duckRollHash) and therefore oracle-checkable, while still
  * being a usable dedup/shard key. doGenCode emits a primitive loop inside
  * whole-stage codegen — no boxing, no virtual calls in the hot path. */
case class StableHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"stable_hash64 needs STRING, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    StableHash64.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.StableHash64.hash($c.getBytes());")

  override def prettyName: String = "stable_hash64"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object StableHash64 {
  final val M = 1000000007L
  /** ASCII inputs match the SQL char-fold; multi-byte UTF-8 folds per byte. */
  def hash(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 131 + (bytes(i) & 0xff)) % M
      i += 1
    }
    h
  }
}

/** Exact-threshold distinct sketch (SURVEY.md §2.9 `udaf_sketch`): counts
  * distinct int64 values exactly while ≤ maxExact, reports -1 once the set
  * exceeds it (the "degrade to sketch" pattern with a deterministic,
  * oracle-checkable contract: CASE WHEN COUNT(DISTINCT x) <= k ...).
  *
  * TypedImperativeAggregate: the buffer is a real mutable HashSet in the
  * aggregation hash map, serialized to varint-free longs for shuffle.
  * Partial aggregation (map-side combine) works normally, so the shuffle
  * carries at most k+1 longs per group, not the raw rows. */
case class ThresholdDistinct(
    child: Expression,
    maxExact: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ThresholdDistinct.Buffer] {
  import ThresholdDistinct.Buffer

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  // Misuse fails at analysis ("needs BIGINT"), not mid-job with an opaque
  // ClassCastException from the asInstanceOf[Long] in update().
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"threshold_distinct needs a BIGINT column, got $t")
  }

  override def createAggregationBuffer(): Buffer = new Buffer()

  private def saturate(b: Buffer): Unit = { b.saturated = true; b.set.clear() }

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    if (!buf.saturated) {
      val v = child.eval(input)
      if (v != null) {
        buf.set.add(v.asInstanceOf[Long])
        if (buf.set.size > maxExact) saturate(buf)
      }
    }
    buf
  }

  override def merge(b1: Buffer, b2: Buffer): Buffer = {
    if (b2.saturated) saturate(b1)
    else if (!b1.saturated) {
      b1.set.addAll(b2.set)
      if (b1.set.size > maxExact) saturate(b1)
    }
    b1
  }

  override def eval(buf: Buffer): Any =
    if (buf.saturated) -1L else buf.set.size.toLong

  override def serialize(buf: Buffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(5 + 8 * buf.set.size)
    bb.put(if (buf.saturated) 1.toByte else 0.toByte)
    bb.putInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new Buffer()
    b.saturated = bb.get() == 1
    val n = bb.getInt
    var i = 0
    while (i < n) { b.set.add(bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): ThresholdDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThresholdDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
  override def prettyName: String = "threshold_distinct"
}

object ThresholdDistinct {
  /** Exact set until saturation; cleared (empty) once saturated. */
  final class Buffer {
    var saturated: Boolean = false
    val set: java.util.HashSet[Long] = new java.util.HashSet[Long]()
  }
}

/** Bounded top-k-rows aggregate (SURVEY.md §2.6 `win_rank` de-skew): keeps
  * the k smallest rows under the total order (ord DESC, key1 ASC, key2 ASC)
  * — i.e. the k highest `ord` values with deterministic tiebreak — in a
  * size-capped tree buffer. This is the scale-correct replacement for
  * `row_number() OVER (PARTITION BY low-card-col ...) <= k`: a window sorts
  * the ENTIRE fact table inside #distinct-group reducer partitions (3 for
  * l_returnflag — a single-key-skew scale-killer AQE cannot split, since
  * skew handling does not apply to window sorts), while this aggregate is
  * map-side combined like any other partial agg — each task reduces its
  * slice to ≤k tuples per group, the shuffle carries ≤ k·p·groups tuples,
  * and the final merge is k-bounded.
  *
  * rank()/dense_rank() stay EXACT when recomputed on the survivors: every
  * row preceding a global top-k row in the total order is itself a global
  * top-k row (at most k−1 rows precede it), so all strictly-greater `ord`
  * values a rank computation counts are present in the output array. The
  * array is emitted in total order, so row_number = position + 1.
  *
  * DUPLICATE ROWS (identical (ord, key1, key2) — lineitem's
  * (l_orderkey, l_linenumber) is NOT unique in the fixtures, core.scala)
  * are first-class: the buffer is a TreeMap entry → multiplicity with the
  * TOTAL multiplicity capped at k, so a duplicate tuple inside the top-k
  * is emitted once per source row, exactly as the window row_number()
  * formulation (and the DuckDB oracle) keeps both rows. */
case class TopKRows(
    ord: Expression,
    key1: Expression,
    key2: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKRows.Buf] {
  import TopKRows.{Buf, Entry}

  override def children: Seq[Expression] = Seq(ord, key1, key2)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", DoubleType, nullable = false),
    StructField("key1", LongType, nullable = false),
    StructField("key2", IntegerType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (ord.dataType, key1.dataType, key2.dataType) match {
      case (DoubleType, LongType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"topk_rows needs (DOUBLE, BIGINT, INT), got $t")
    }

  override def createAggregationBuffer(): Buf = new Buf

  /** Add `c` copies of `e`; trim the worst entries so Σ multiplicity ≤ k. */
  private def add(buf: Buf, e: Entry, c: Int): Unit = {
    buf.map.merge(e, c, (x: Integer, y: Integer) => Integer.valueOf(x + y))
    buf.total += c
    while (buf.total > k) {
      val last = buf.map.lastEntry()
      val over = buf.total - k
      if (last.getValue <= over) {
        buf.total -= last.getValue
        buf.map.remove(last.getKey); ()
      } else {
        buf.map.put(last.getKey, last.getValue - over)
        buf.total = k
      }
    }
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val o = ord.eval(input)
    val a = key1.eval(input)
    val b = key2.eval(input)
    if (o != null && a != null && b != null)
      add(buf, Entry(o.asInstanceOf[Double], a.asInstanceOf[Long], b.asInstanceOf[Int]), 1)
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    val it = b2.map.entrySet().iterator()
    while (it.hasNext) {
      val kv = it.next()
      add(b1, kv.getKey, kv.getValue)
    }
    b1
  }

  override def eval(buf: Buf): Any = {
    val out = new Array[Any](buf.total)
    val it = buf.map.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val kv = it.next()
      val e = kv.getKey
      var c = kv.getValue.intValue()
      while (c > 0) {
        out(i) = InternalRow(e.ord, e.key1, e.key2)
        i += 1; c -= 1
      }
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 24 * buf.map.size)
    bb.putInt(buf.map.size)
    val it = buf.map.entrySet().iterator()
    while (it.hasNext) {
      val kv = it.next()
      val e = kv.getKey
      bb.putDouble(e.ord); bb.putLong(e.key1); bb.putInt(e.key2)
      bb.putInt(kv.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new Buf
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val e = Entry(bb.getDouble, bb.getLong, bb.getInt)
      val c = bb.getInt
      b.map.put(e, c)
      b.total += c
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKRows =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKRows =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(ord = cs(0), key1 = cs(1), key2 = cs(2))
  override def prettyName: String = "topk_rows"
}

object TopKRows {
  /** Entry → multiplicity, ordered by the total order; `total` = Σ counts
    * (maintained ≤ k by [[TopKRows.add]]). */
  final class Buf {
    val map: java.util.TreeMap[Entry, Integer] = new java.util.TreeMap[Entry, Integer]()
    var total: Int = 0
  }

  /** Total order: ord DESC, then key1 ASC, key2 ASC (deterministic ties). */
  final case class Entry(ord: Double, key1: Long, key2: Int)
      extends Comparable[Entry] {
    override def compareTo(that: Entry): Int = {
      val c = java.lang.Double.compare(that.ord, this.ord) // DESC
      if (c != 0) c
      else {
        val c1 = java.lang.Long.compare(this.key1, that.key1)
        if (c1 != 0) c1 else Integer.compare(this.key2, that.key2)
      }
    }
  }
}

/** True Catalyst Generator (SURVEY.md §2.9 `udtf_tokenize`): one text row →
  * (pos, token) rows. Unlike explode(split(...)), a Generator controls its
  * own output schema and row construction — this is the UDTF extension
  * point. Emits 1-based positions to match SQL WITH ORDINALITY. */
case class TokenizeGenerator(child: Expression) extends Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def children: Seq[Expression] = Seq(child)

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("token", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"tokenize needs STRING, got $t")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val toks = v.asInstanceOf[UTF8String].toString.split(" ", -1)
      toks.iterator.zipWithIndex.map { case (t, i) =>
        InternalRow(i + 1, UTF8String.fromString(t))
      }
    }
  }

  override def prettyName: String = "tokenize"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

/** Count–Min sketch (Cormode–Muthukrishnan '05) over int64 keys: 3 hash
  * rows of exact cell counts, PER-ROW PRIME widths (61/67/71). The widths
  * matter: with one shared width w, the rows' linear hashes
  * (Aⱼ·x + Bⱼ) mod P mod w collide on exactly the same key pairs whenever
  * the P-wrap doesn't engage (any Δ ≡ 0 mod w collides in EVERY row, so
  * min-of-rows buys nothing); coprime widths push all-row collisions out
  * to Δ ≡ 0 mod lcm(61,67,71) = 290 057.
  *
  * The hash family is public arithmetic — ((Aⱼ·(x mod P) + Bⱼ) mod P) mod
  * Wⱼ with P = 1e9+7 — so the DuckDB oracle replays every cell as a plain
  * GROUP BY count and every estimate as LEAST over the three looked-up
  * cells: the sketch is exact-replayable, not just bounds-checkable.
  *
  * Scale shape: the buffer is one flat 199-long array; update is three
  * array adds, merge is an elementwise vector add — ORDER-FREE and
  * map-side combinable, so a 100 TB group shuffles 199 longs per partial,
  * never rows. The same order-freedom is what makes the streaming twin
  * (stream_countmin_maintain) fold ≡ batch bit-for-bit. */
case class CountMinSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  import CountMinSketch._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"count_min needs a BIGINT column, got $t")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Cells)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var j = 0
      while (j < Rows) { buf(Off(j) + bucket(j, x)) += 1; j += 1 }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Cells) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * Cells)
    var i = 0
    while (i < Cells) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](Cells)
    var i = 0
    while (i < Cells) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
  override def prettyName: String = "count_min"
}

object CountMinSketch {
  final val P = 1000000007L
  final val Rows = 3
  final val A = Array(131L, 137L, 139L)
  final val B = Array(7L, 11L, 13L)
  /** Per-row prime widths (see class doc for why they must differ). */
  final val W = Array(61, 67, 71)
  /** Flat-array offsets of each row: 0, 61, 128. */
  final val Off = Array(0, W(0), W(0) + W(1))
  final val Cells = W.sum

  /** Works for the FULL Long domain: count_min is registered as a general
    * SQL function, so negative keys must hash to a valid cell (JVM % is
    * dividend-signed — a plain % would throw for row 0 and silently land
    * rows 1–2 inside the PREVIOUS row's cells). floorMod everywhere; the
    * engine-side SQL replays (CustomExprOps.cmBucket) mirror with pmod /
    * DuckDB's arithmetic equivalent. */
  def bucket(j: Int, x: Long): Int =
    Math.floorMod(Math.floorMod(A(j) * Math.floorMod(x, P) + B(j), P), W(j).toLong).toInt
}

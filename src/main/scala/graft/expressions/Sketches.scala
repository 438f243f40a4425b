package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * aggregate.
  *
  * Why this exists next to `approx_count_distinct`: HLL++ register
  * merging is engine-specific, so q16's sketch can only be rows-only
  * checked. KMV over an EXPLICIT hash column is engine-portable — the
  * k smallest md5-derived values of a group are a deterministic set,
  * so the estimate is bit-reproducible in any engine (the DuckDB
  * oracle replays it with a window) while keeping the properties that
  * matter at 100 TB: bounded state (k longs per group), map-side
  * partial aggregation, and associative/commutative MERGES — the
  * per-partition sketches combine by keeping the k smallest of the
  * union, so a 1000-executor rollup is one shuffle of k-long buffers,
  * never of raw values.
  *
  * Estimator (Bar-Yossef et al.): inputs are uniform hashes in
  * [0, 2³²); with U(k) the k-th smallest, E[U(k)] ≈ k·M/(n+1) for M =
  * 2³², so n̂ = (k−1)·M / U(k) (the −1 debiases). Groups with fewer
  * than k distinct hashes are counted EXACTLY (the sketch holds them
  * all) — the estimator only engages past its own capacity.
  *
  * Input column must already be the 32-bit hash as a long (the query
  * derives it: first 8 hex chars of md5 — same construction the
  * minhash family uses, replayable in SQL).
  */
/** Bottom-k-sample quantile sketch: the rows whose hash keys are the
  * k smallest in the group form a DETERMINISTIC uniform sample (the
  * hash is uniform and row-independent), and the quantile estimate is
  * the exact interpolated quantile of that sample. Same 100 TB
  * properties as [[KmvDistinctAgg]] — k-entry bounded state,
  * map-side partial, associative merge (k smallest of the union) —
  * and, unlike t-digest, the sample set is deterministic, so a SQL
  * engine replays it with a window (`row_number() OVER (ORDER BY
  * hash) <= k` + `quantile_cont`). Hash keys are full md5 hex strings
  * (128-bit): collision-free in practice, so the sample never
  * silently drops a row the oracle keeps.
  *
  * Interpolation matches `quantile_cont` exactly: h = (n−1)·p,
  * v = v[⌊h⌋] + (h−⌊h⌋)·(v[⌊h⌋+1] − v[⌊h⌋]) over the value-sorted
  * sample.
  */
case class BottomKQuantilesAgg(
    left: Expression,   // hash key (string)
    right: Expression,  // value (double)
    k: Int,
    probs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[String, Double]]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  override def prettyName: String = "bottomk_quantiles"
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): java.util.TreeMap[String, Double] =
    new java.util.TreeMap[String, Double]()

  /** The hash column must be unique per row (md5 of a row-unique
    * value): a duplicate key would silently overwrite a sample entry,
    * shrinking the sample and diverging from the oracle's replay.
    * Duplicates with the SAME value are tolerated (idempotent —
    * retried tasks re-feed rows); a duplicate with a DIFFERENT value
    * is a caller bug and fails loud wherever the two copies first
    * meet (update or merge).
    */
  private def insert(buf: java.util.TreeMap[String, Double],
      h: String, v: Double): Unit = {
    // containsKey, NOT a get-against-null check: the map's value type
    // is scala.Double, so `get` compiles to unbox-then-rebox and a
    // missing key surfaces as boxed 0.0, never null
    if (buf.containsKey(h)) {
      val prev = buf.get(h)
      if (prev != v) throw new IllegalStateException(
        s"bottomk_quantiles: duplicate hash key $h with differing values " +
          s"($prev vs $v) — the hash column must be unique per row")
    } else if (buf.size < k) { buf.put(h, v); () }
    else if (h < buf.lastKey) {
      buf.put(h, v)
      if (buf.size > k) { buf.remove(buf.lastKey); () }
    }
  }

  override def update(buf: java.util.TreeMap[String, Double],
      input: InternalRow): java.util.TreeMap[String, Double] = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null) {
      val hs = h.toString
      // validate the key shape HERE, where the offending row is being
      // consumed — not at serialize time, where the failure surfaces
      // only at shuffle and far from the cause
      require(hs.length == 32,
        s"bottomk_quantiles: hash key must be 32-char md5 hex, got '$hs'")
      insert(buf, hs, v.asInstanceOf[Double])
    }
    buf
  }

  override def merge(buf: java.util.TreeMap[String, Double],
      other: java.util.TreeMap[String, Double]): java.util.TreeMap[String, Double] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); insert(buf, e.getKey, e.getValue) }
    buf
  }

  override def eval(buf: java.util.TreeMap[String, Double]): Any = {
    if (buf.isEmpty) return null
    val vals = new Array[Double](buf.size)
    val it = buf.values().iterator()
    var i = 0
    while (it.hasNext) { vals(i) = it.next(); i += 1 }
    java.util.Arrays.sort(vals)
    val n = vals.length
    val out = probs.map { p =>
      val h = (n - 1) * p
      val lo = h.toInt
      if (lo + 1 >= n) vals(n - 1)
      else vals(lo) + (h - lo) * (vals(lo + 1) - vals(lo))
    }.toArray
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeMap[String, Double]): Array[Byte] = {
    val entries = buf.entrySet()
    val bb = java.nio.ByteBuffer.allocate(entries.size * 40)
    val it = entries.iterator()
    while (it.hasNext) {
      val e = it.next()
      // key shape was validated at update(); 32 bytes per key here is
      // an invariant, not a user-input check
      bb.put(e.getKey.getBytes("UTF-8")); bb.putDouble(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[String, Double] = {
    val buf = createAggregationBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val hb = new Array[Byte](32)
    while (bb.remaining() >= 40) {
      bb.get(hb)
      buf.put(new String(hb, "UTF-8"), bb.getDouble)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKQuantilesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKQuantilesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BottomKQuantilesAgg =
    copy(left = newLeft, right = newRight)
}

/** Count-Min frequency sketch as a native Catalyst aggregate — the
  * third deterministic sketch next to [[KmvDistinctAgg]] (distinct)
  * and [[BottomKQuantilesAgg]] (quantiles): point-frequency estimates
  * over a stream of items in d·w longs per group.
  *
  * Determinism: the d hash rows are the same md5-derived affine
  * family the minhash expressions use (row j buckets item (h1, h2)
  * at (h1 + (j+1)·h2) mod P mod w, P = largest prime < 2³²), and
  * MERGE is element-wise addition — fully commutative/associative —
  * so the sketch is bit-identical under any partitioning and a SQL
  * engine replays it exactly (group token counts by (j, bucket), min
  * over rows). That replayability is what HLL/t-digest/Spark's CMS
  * (whose serialized layouts are engine-private) cannot give.
  *
  * 100 TB posture: constant state per group (d·w longs), map-side
  * partial aggregation, one shuffle of flat buffers; estimates are
  * one-sided (est ≥ true count, overshoot bounded by Σcounts·e/w at
  * confidence 1−e^−d).
  *
  * Inputs: h1, h2 = first/second 8 md5 hex chars of the item as
  * longs (the query derives them — same construction as MinHashSig).
  */
case class CountMinAgg(
    left: Expression,   // h1 (long)
    right: Expression,  // h2 (long)
    d: Int,
    w: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  private val P = 4294967291L

  override def prettyName: String = "count_min"
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h1 = left.eval(input)
    val h2 = right.eval(input)
    if (h1 != null && h2 != null) {
      val a = h1.asInstanceOf[Long]
      val b = h2.asInstanceOf[Long]
      var j = 0
      while (j < d) {
        // a, b < 2³² and (j+1) ≤ d, so (j+1)·b + a < 2⁶³: no overflow,
        // operands nonnegative so % is a true mod in any engine
        buf(j * w + (((a + (j + 1) * b) % P) % w).toInt) += 1
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = createAggregationBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var i = 0
    while (bb.remaining() >= 8) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinAgg =
    copy(left = newLeft, right = newRight)
}

case class KmvDistinctAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  override def prettyName: String = "kmv_distinct"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last) { if (buf.add(h)) { buf.pollLast(); () } }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.isEmpty) null
    else if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble * 4294967296.0 / buf.last.toDouble

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) buf.add(bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinctAgg =
    copy(child = newChild)
}

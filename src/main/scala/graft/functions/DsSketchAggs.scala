package graft.functions

import org.apache.datasketches.frequencies.{ItemsSketch, LongsSketch}
import org.apache.datasketches.kll.{KllDoublesSketch, KllItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.common.{ArrayOfLongsSerDe, ArrayOfStringsSerDe}
import org.apache.datasketches.sampling.{ReservoirLongsUnion, VarOptItemsSketch, VarOptItemsUnion}
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union}
import org.apache.datasketches.tuple.arrayofdoubles.{ArrayOfDoublesSetOperationBuilder, ArrayOfDoublesSketch, ArrayOfDoublesUnion, ArrayOfDoublesUpdatableSketch, ArrayOfDoublesUpdatableSketchBuilder}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Datasketches-backed Catalyst aggregate functions — the mergeable
  * sketch families Spark's builtins don't cover:
  *
  *   - **Theta** (KMV set sketches): unlike HLL, theta sketches support
  *     set ALGEBRA — union, intersection, A-not-B — each with error
  *     bounds, so "distinct users in cohort A but not B" is answerable
  *     from two kilobyte sketches instead of a distinct-shuffle of both
  *     cohorts' rows.
  *   - **KLL** (quantiles): like `percentile_approx` (Greenwald–Khanna)
  *     but with a PERSISTABLE, mergeable binary form — per-shard
  *     partials in a sketch table merge to full-table quantiles without
  *     re-scanning rows (the quantile analogue of `hll_sketch_agg`).
  *   - **Frequencies** (Misra–Gries LongsSketch): heavy hitters with
  *     deterministic error bounds (lb ≤ true ≤ ub) and a
  *     no-false-negatives guarantee above the sketch's max error —
  *     mergeable, unlike a top-k groupBy which needs the full key space.
  *
  * All three follow Spark's own Datasketches-HLL integration shape
  * (`TypedImperativeAggregate`, e.g. HllSketchAgg in
  * catalyst's datasketchesAggregates.scala): partials fold rows into a
  * fixed-size native sketch per partition, only sketch bytes cross the
  * exchange (ObjectHashAggregate / SortAggregate), and each aggregate
  * DOUBLES as its own merge function — a BinaryType child is unioned as
  * a pre-built sketch, anything else is updated as a raw value. That
  * one-function-two-modes design is what makes the two-level sketch
  * table (partials per shard → merged estimate) a plain re-aggregation.
  *
  * The reference library (SURVEY.md §3a) has no aggregation layer;
  * these are pipeline-category operators for the 100 TB engine.
  */
object DsSketchAggs {

  /** Register the three aggregates for `call_function` / SQL use.
    * Second argument of each is the (literal) size parameter. */
  def register(spark: SparkSession): Unit = {
    def litInt(e: Expression): Int = e.eval() match {
      case i: Int  => i
      case l: Long => l.toInt
      case other   => throw new IllegalArgumentException(
        s"size parameter must be an integer literal, got $other")
    }
    val reg = spark.sessionState.functionRegistry
    // idempotent: re-registering identical builders is harmless but noisy
    if (reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_theta_agg"))) return
    reg.createOrReplaceTempFunction("graft_theta_agg",
      exprs => ThetaSketchAgg(exprs.head, litInt(exprs(1))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_kll_agg",
      exprs => KllDoublesAgg(exprs.head, litInt(exprs(1))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_freq_agg",
      exprs => FreqLongsAgg(exprs.head, litInt(exprs(1))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_tuple_agg",
      exprs => TupleSumAgg(exprs.head, exprs(1), litInt(exprs(2))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_reservoir_agg",
      exprs => ReservoirLongsAgg(exprs.head, litInt(exprs(1))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_varopt_agg",
      exprs => VarOptLongsAgg(exprs.head, exprs(1), litInt(exprs(2))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_freq_strings_agg",
      exprs => FreqStringsAgg(exprs.head, litInt(exprs(1))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_kll_strings_agg",
      exprs => KllStringsAgg(exprs.head, litInt(exprs(1))), "scala_udf")
  }

  private[graft] def wrapTheta(bytes: Array[Byte]): CompactSketch =
    CompactSketch.wrap(Memory.wrap(bytes))
}

/** Mergeable uniform reservoir sample of a long column: each partition
  * folds its rows into a k-slot reservoir, reservoirs union into a
  * statistically valid k-sample of the COMBINED stream (weighted by
  * each side's n) — the one-pass distributed sampling primitive a
  * 100 TB table needs (a naive per-partition sample then limit(k) is
  * NOT uniform; the union's n-weighting is what makes this one valid).
  * Binary input = pre-built-sketch merge mode like the other families.
  */
case class ReservoirLongsAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ReservoirLongsUnion] with UnaryLike[Expression] {

  override def prettyName: String = "graft_reservoir_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): ReservoirLongsUnion =
    ReservoirLongsUnion.newInstance(k)

  override def update(buf: ReservoirLongsUnion, row: InternalRow): ReservoirLongsUnion = {
    val v = child.eval(row)
    if (v != null) child.dataType match {
      case BinaryType =>
        buf.update(Memory.wrap(v.asInstanceOf[Array[Byte]]))
      case LongType    => buf.update(v.asInstanceOf[Long])
      case IntegerType => buf.update(v.asInstanceOf[Int].toLong)
      case dt => throw new UnsupportedOperationException(s"reservoir_agg: $dt")
    }
    buf
  }

  override def merge(a: ReservoirLongsUnion, b: ReservoirLongsUnion): ReservoirLongsUnion = {
    val r = b.getResult
    if (r != null) a.update(r)
    a
  }
  // an all-NULL (or empty) group leaves the union empty and getResult
  // returns null — emit a real empty reservoir instead of an NPE
  override def eval(buf: ReservoirLongsUnion): Any = {
    val r = buf.getResult
    if (r == null)
      org.apache.datasketches.sampling.ReservoirLongsSketch.newInstance(k).toByteArray
    else r.toByteArray
  }
  override def serialize(buf: ReservoirLongsUnion): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): ReservoirLongsUnion =
    ReservoirLongsUnion.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(n: Int): ReservoirLongsAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ReservoirLongsAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): ReservoirLongsAgg =
    copy(child = newChild)
}

/** Mutable buffer for [[VarOptLongsAgg]] — same lazy raw-side/union-side
  * reconciliation as [[TupleBuf]], safe under every aggregation call
  * order. */
final class VarOptBuf(k: Int) {
  var upd: VarOptItemsSketch[java.lang.Long] = _
  var uni: VarOptItemsUnion[java.lang.Long] = _
  def update(key: Long, weight: Double): Unit = {
    if (upd == null) upd = VarOptItemsSketch.newInstance[java.lang.Long](k)
    upd.update(java.lang.Long.valueOf(key), weight)
  }
  def union(sk: VarOptItemsSketch[java.lang.Long]): Unit = {
    if (uni == null) uni = VarOptItemsUnion.newInstance[java.lang.Long](k)
    uni.update(sk)
  }
  def current: VarOptItemsSketch[java.lang.Long] = {
    if (upd != null) { union(upd); upd = null }
    if (uni == null) VarOptItemsSketch.newInstance[java.lang.Long](k)
    else uni.getResult
  }
}

/** VarOpt WEIGHTED sample aggregate over (long key, positive weight):
  * a mergeable fixed-k sample whose inclusion probabilities are
  * proportional to weight and whose retained (item, adjusted-weight)
  * pairs preserve the stream's TOTAL weight exactly and give unbiased
  * subset-sum estimates (Σ adjusted weights over any predicate ≈ the
  * predicate's true weight). The weighted complement of
  * [[ReservoirLongsAgg]] — e.g. sample documents ∝ length so the
  * sample's token mass mirrors the corpus. NULL or non-positive
  * weights skip the row (the library rejects them; SQL parity =
  * `WHERE weight > 0`). Binary input = pre-built-sketch merge mode. */
case class VarOptLongsAgg(key: Expression, weight: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VarOptBuf] with BinaryLike[Expression] {

  override def prettyName: String = "graft_varopt_agg"
  override def left: Expression = key
  override def right: Expression = weight
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  private def serde = new ArrayOfLongsSerDe()

  override def createAggregationBuffer(): VarOptBuf = new VarOptBuf(k)

  override def update(buf: VarOptBuf, row: InternalRow): VarOptBuf = {
    val kv = key.eval(row)
    if (kv != null) key.dataType match {
      case BinaryType =>
        buf.union(VarOptItemsSketch.heapify(
          Memory.wrap(kv.asInstanceOf[Array[Byte]]), serde))
      case _ =>
        val kl = key.dataType match {
          case LongType    => kv.asInstanceOf[Long]
          case IntegerType => kv.asInstanceOf[Int].toLong
          case dt => throw new UnsupportedOperationException(s"varopt_agg key: $dt")
        }
        val w = weight.eval(row)
        val wd = if (w == null) 0.0 else weight.dataType match {
          case DoubleType  => w.asInstanceOf[Double]
          case FloatType   => w.asInstanceOf[Float].toDouble
          case LongType    => w.asInstanceOf[Long].toDouble
          case IntegerType => w.asInstanceOf[Int].toDouble
          case dt => throw new UnsupportedOperationException(s"varopt_agg weight: $dt")
        }
        if (wd > 0.0) buf.update(kl, wd)
    }
    buf
  }

  override def merge(a: VarOptBuf, b: VarOptBuf): VarOptBuf = {
    a.union(b.current); a
  }
  override def eval(buf: VarOptBuf): Any = buf.current.toByteArray(serde)
  override def serialize(buf: VarOptBuf): Array[Byte] = buf.current.toByteArray(serde)
  override def deserialize(bytes: Array[Byte]): VarOptBuf = {
    val b = new VarOptBuf(k)
    b.union(VarOptItemsSketch.heapify(Memory.wrap(bytes), serde))
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): VarOptLongsAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): VarOptLongsAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VarOptLongsAgg =
    copy(key = newLeft, weight = newRight)
}

/** Mutable buffer for [[TupleSumAgg]]: raw rows fold into an updatable
  * sketch; pre-built sketches fold into a union. Either side may be
  * absent; [[current]] reconciles them at merge/eval/serialize time.
  * This tolerates EVERY call order the aggregation framework can
  * produce (update after deserialize included — sort-based fallback). */
final class TupleBuf(lgK: Int) {
  var upd: ArrayOfDoublesUpdatableSketch = _
  var uni: ArrayOfDoublesUnion = _
  def update(key: Long, value: Double): Unit = {
    if (upd == null)
      upd = new ArrayOfDoublesUpdatableSketchBuilder()
        .setNominalEntries(1 << lgK).setNumberOfValues(1).build()
    upd.update(key, Array(value))
  }
  def union(sk: ArrayOfDoublesSketch): Unit = {
    if (uni == null)
      uni = new ArrayOfDoublesSetOperationBuilder()
        .setNominalEntries(1 << lgK).setNumberOfValues(1).buildUnion()
    uni.union(sk)
  }
  /** Fold any raw-update side into the union and return one sketch. */
  def current: ArrayOfDoublesSketch = {
    if (upd != null) {
      union(upd.compact())
      upd = null
    }
    if (uni == null)
      new ArrayOfDoublesUpdatableSketchBuilder()
        .setNominalEntries(1 << lgK).setNumberOfValues(1).build().compact()
    else uni.getResult
  }
}

/** Tuple (theta-with-summaries) sketch aggregate: per DISTINCT `key`,
  * the element-wise SUM of `value` rides along with the retained hash —
  * so a sketch table answers "how many distinct keys, and how much
  * metric do they carry" INCLUDING under set algebra (the summary of a
  * key in an intersection combines both cohorts' sums). Exact below
  * 2^lgK distinct keys; above it, retained sums scale by 1/θ to
  * estimate the population total. Binary input = pre-built-sketch merge
  * mode, like the other families. */
case class TupleSumAgg(key: Expression, value: Expression, lgK: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TupleBuf] with BinaryLike[Expression] {

  override def prettyName: String = "graft_tuple_agg"
  override def left: Expression = key
  override def right: Expression = value
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TupleBuf = new TupleBuf(lgK)

  override def update(buf: TupleBuf, row: InternalRow): TupleBuf = {
    val k = key.eval(row)
    if (k != null) key.dataType match {
      case BinaryType =>
        buf.union(ArrayOfDoublesSketch.heapify(
          Memory.wrap(k.asInstanceOf[Array[Byte]])))
      case _ =>
        val kl = key.dataType match {
          case LongType    => k.asInstanceOf[Long]
          case IntegerType => k.asInstanceOf[Int].toLong
          case dt => throw new UnsupportedOperationException(s"tuple_agg key: $dt")
        }
        // a NULL metric still counts the KEY (summary contribution 0.0)
        // — distinct semantics match COUNT(DISTINCT key), and the sum
        // matches SQL SUM, which ignores NULLs
        val v = value.eval(row)
        val vd = if (v == null) 0.0 else value.dataType match {
          case DoubleType  => v.asInstanceOf[Double]
          case FloatType   => v.asInstanceOf[Float].toDouble
          case LongType    => v.asInstanceOf[Long].toDouble
          case IntegerType => v.asInstanceOf[Int].toDouble
          case dt => throw new UnsupportedOperationException(s"tuple_agg value: $dt")
        }
        buf.update(kl, vd)
    }
    buf
  }

  override def merge(a: TupleBuf, b: TupleBuf): TupleBuf = {
    a.union(b.current); a
  }
  override def eval(buf: TupleBuf): Any = buf.current.toByteArray
  override def serialize(buf: TupleBuf): Array[Byte] = buf.current.toByteArray
  override def deserialize(bytes: Array[Byte]): TupleBuf = {
    val b = new TupleBuf(lgK)
    b.union(ArrayOfDoublesSketch.heapify(Memory.wrap(bytes)))
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): TupleSumAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TupleSumAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TupleSumAgg =
    copy(key = newLeft, value = newRight)
}

/** Theta sketch aggregate: raw values (long/int/string/double) or
  * pre-built sketch bytes → compact theta sketch bytes. `lgK` = log2
  * nominal entries (sketch is EXACT below 2^lgK distinct values). */
case class ThetaSketchAgg(child: Expression, lgK: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def prettyName: String = "graft_theta_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, row: InternalRow): Union = {
    val v = child.eval(row)
    if (v != null) child.dataType match {
      case BinaryType  => buf.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
      case LongType    => buf.update(v.asInstanceOf[Long])
      case IntegerType => buf.update(v.asInstanceOf[Int].toLong)
      case DoubleType  => buf.update(v.asInstanceOf[Double])
      case StringType  => buf.update(v.asInstanceOf[UTF8String].toString)
      case dt => throw new UnsupportedOperationException(s"theta_agg: $dt")
    }
    buf
  }

  override def merge(a: Union, b: Union): Union = { a.union(b.getResult); a }
  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer(); u.union(Memory.wrap(bytes)); u
  }

  override def withNewMutableAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** KLL doubles-quantile sketch aggregate: raw numeric values or
  * pre-built sketch bytes → KLL sketch bytes. `k` controls rank error
  * (`KllSketch.getNormalizedRankError(k, false)`); a sketch with
  * n ≤ k retains every value (exact quantiles). */
case class KllDoublesAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def prettyName: String = "graft_kll_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, row: InternalRow): KllDoublesSketch = {
    val v = child.eval(row)
    if (v != null) child.dataType match {
      case BinaryType =>
        buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
      case DoubleType  => buf.update(v.asInstanceOf[Double])
      case FloatType   => buf.update(v.asInstanceOf[Float].toDouble)
      case LongType    => buf.update(v.asInstanceOf[Long].toDouble)
      case IntegerType => buf.update(v.asInstanceOf[Int].toDouble)
      case dt => throw new UnsupportedOperationException(s"kll_agg: $dt")
    }
    buf
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }
  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(n: Int): KllDoublesAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllDoublesAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): KllDoublesAgg =
    copy(child = newChild)
}

/** Misra–Gries frequent-items aggregate over long keys (or pre-built
  * sketch bytes). `maxMapSize` (power of 2) bounds memory AND the error:
  * true − estimate ≤ getMaximumError ≤ 3.5·n/maxMapSize. */
case class FreqLongsAgg(child: Expression, maxMapSize: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongsSketch] with UnaryLike[Expression] {

  override def prettyName: String = "graft_freq_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): LongsSketch = new LongsSketch(maxMapSize)

  override def update(buf: LongsSketch, row: InternalRow): LongsSketch = {
    val v = child.eval(row)
    if (v != null) child.dataType match {
      case BinaryType =>
        buf.merge(LongsSketch.getInstance(Memory.wrap(v.asInstanceOf[Array[Byte]])))
      case LongType    => buf.update(v.asInstanceOf[Long])
      case IntegerType => buf.update(v.asInstanceOf[Int].toLong)
      case dt => throw new UnsupportedOperationException(s"freq_agg: $dt")
    }
    buf
  }

  override def merge(a: LongsSketch, b: LongsSketch): LongsSketch = a.merge(b)
  override def eval(buf: LongsSketch): Any = buf.toByteArray
  override def serialize(buf: LongsSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(n: Int): FreqLongsAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FreqLongsAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): FreqLongsAgg =
    copy(child = newChild)
}

/** Misra–Gries frequent-items aggregate over STRING items — the
  * vocabulary analogue of [[FreqLongsAgg]] (same deterministic
  * lb ≤ true ≤ ub and NO_FALSE_NEGATIVES guarantees), serialized with
  * the library's `ArrayOfStringsSerDe`. Accepts three inputs:
  * StringType rows (one item per row), ArrayType(StringType) rows —
  * every element updates the sketch WITHOUT exploding tokens into rows,
  * so corpus-wide token heavy hitters cost one narrow pass and a
  * kilobyte-sketch exchange instead of a token-grain shuffle — and
  * BinaryType (pre-built-sketch merge mode like the other families). */
case class FreqStringsAgg(child: Expression, maxMapSize: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] with UnaryLike[Expression] {

  override def prettyName: String = "graft_freq_strings_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  private def serde = new ArrayOfStringsSerDe()

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String], row: InternalRow): ItemsSketch[String] = {
    val v = child.eval(row)
    if (v != null) child.dataType match {
      case BinaryType =>
        buf.merge(ItemsSketch.getInstance(
          Memory.wrap(v.asInstanceOf[Array[Byte]]), serde))
      case StringType => buf.update(v.asInstanceOf[UTF8String].toString)
      case ArrayType(StringType, _) =>
        val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        var i = 0
        while (i < arr.numElements()) {
          if (!arr.isNullAt(i)) buf.update(arr.getUTF8String(i).toString)
          i += 1
        }
      case dt => throw new UnsupportedOperationException(s"freq_strings_agg: $dt")
    }
    buf
  }

  override def merge(a: ItemsSketch[String], b: ItemsSketch[String]): ItemsSketch[String] =
    a.merge(b)
  override def eval(buf: ItemsSketch[String]): Any = buf.toByteArray(serde)
  override def serialize(buf: ItemsSketch[String]): Array[Byte] = buf.toByteArray(serde)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  override def withNewMutableAggBufferOffset(n: Int): FreqStringsAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FreqStringsAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): FreqStringsAgg =
    copy(child = newChild)
}

/** KLL quantile sketch aggregate over STRING items under lexicographic
  * order — mergeable string quantiles, i.e. the distributed primitive
  * for RANGE-PARTITION SPLIT POINTS of a string sort key (what Spark's
  * RangePartitioner approximates by sampling rows; here per-shard
  * sketch tables merge to global split points without a row sample).
  * Comparator = Java natural String order, which equals byte order for
  * ASCII keys — keep keys ASCII so engine-side and SQL-side comparisons
  * agree (the query layer's rank checks rely on it). Raw StringType
  * input updates; BinaryType merges a pre-built sketch. */
case class KllStringsAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllItemsSketch[String]] with UnaryLike[Expression] {

  override def prettyName: String = "graft_kll_strings_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  private def serde = new ArrayOfStringsSerDe()
  private def cmp = java.util.Comparator.naturalOrder[String]()

  override def createAggregationBuffer(): KllItemsSketch[String] =
    KllItemsSketch.newHeapInstance[String](k, cmp, serde)

  override def update(buf: KllItemsSketch[String], row: InternalRow): KllItemsSketch[String] = {
    val v = child.eval(row)
    if (v != null) child.dataType match {
      case BinaryType =>
        buf.merge(KllItemsSketch.heapify(
          Memory.wrap(v.asInstanceOf[Array[Byte]]), cmp, serde))
      case StringType => buf.update(v.asInstanceOf[UTF8String].toString)
      case dt => throw new UnsupportedOperationException(s"kll_strings_agg: $dt")
    }
    buf
  }

  override def merge(a: KllItemsSketch[String],
      b: KllItemsSketch[String]): KllItemsSketch[String] = { a.merge(b); a }
  override def eval(buf: KllItemsSketch[String]): Any = buf.toByteArray
  override def serialize(buf: KllItemsSketch[String]): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllItemsSketch[String] =
    KllItemsSketch.heapify(Memory.wrap(bytes), cmp, serde)

  override def withNewMutableAggBufferOffset(n: Int): KllStringsAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllStringsAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): KllStringsAgg =
    copy(child = newChild)
}

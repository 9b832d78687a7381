package graft.ops

import graft.analysis.Analyzer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries summary buffer: ≤ `capacity` counters, the exact item
  * count `n`, and the summary's accumulated ERROR BOUND — every
  * decrement round (update overflow) and every merge-time threshold
  * subtraction adds to `err`, preserving the invariant
  * `c(t) ≤ f(t) ≤ c(t) + err` for EVERY term t (c(t) = 0 when absent).
  * Carrying err explicitly makes the downstream exactness guard tight:
  * a summary that never decremented proves err = 0 regardless of the
  * worst-case n/(capacity+1) theory bound. */
final class MGBuffer(val capacity: Int) {
  val counts = new java.util.HashMap[String, Long](capacity * 2)
  var err: Long = 0L
  var n: Long = 0L

  def add(term: String): Unit = {
    n += 1L
    // explicit absent-key default (round-5 advice): relying on Scala's
    // silent null→0L unboxing of HashMap.get is refactor-fragile
    val cur = counts.getOrDefault(term, 0L)
    if (cur > 0L) counts.put(term, cur + 1L)
    else if (counts.size < capacity) counts.put(term, 1L)
    else { // decrement-all round: one unit of error for every term
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
      err += 1L
    }
  }
}

/** HEAVY HITTERS over a token stream as a custom Catalyst aggregate —
  * the Misra–Gries frequent-items summary (Misra & Gries 1982) with the
  * MERGEABLE-summaries combine step (Agarwal et al., PODS 2012): partial
  * (map-side) summaries merge by adding counters and, on overflow past
  * `capacity`, subtracting the (capacity+1)-th largest value from all —
  * the subtracted threshold joins the error bound. One aggregate over
  * the exploded token relation yields a ≤ capacity-entry candidate set
  * (+ its error bound + the exact stream length), never shuffling raw
  * tokens beyond the map-side partials: the classic two-pass
  * heavy-hitters shape that survives a 10^12-token stream where an
  * exact groupBy of the full vocabulary would shuffle Heaps-law-many
  * keys just to keep the top handful. */
case class MisraGriesAgg(
    term: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer] {

  require(capacity >= 1, s"capacity must be >= 1 (got $capacity)")

  override def children: Seq[Expression] = Seq(term)
  override def nullable: Boolean = false

  private val entryType = StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false)))

  /** (err, n, entries): the error bound, the exact item count (it rides
    * the same pass for free), and the surviving counters. */
  override def dataType: DataType = StructType(Seq(
    StructField("err", LongType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("entries", ArrayType(entryType, containsNull = false),
      nullable = false)))

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(capacity)

  override def update(buf: MGBuffer, row: InternalRow): MGBuffer = {
    val t = term.eval(row)
    if (t != null) buf.add(t.toString)
    buf
  }

  override def merge(a: MGBuffer, b: MGBuffer): MGBuffer = {
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      a.counts.merge(e.getKey, e.getValue, (x, y) => x + y)
    }
    a.err += b.err
    a.n += b.n
    if (a.counts.size > capacity) {
      // subtract the (capacity+1)-th largest from every counter; zeros drop
      val vals = new Array[Long](a.counts.size)
      var i = 0
      val vi = a.counts.values().iterator()
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val thresh = vals(vals.length - capacity - 1)
      val ei = a.counts.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        if (e.getValue <= thresh) ei.remove()
        else e.setValue(e.getValue - thresh)
      }
      a.err += thresh
    }
    a
  }

  override def eval(buf: MGBuffer): Any = {
    val entries = new Array[Any](buf.counts.size)
    var i = 0
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      entries(i) = InternalRow(UTF8String.fromString(e.getKey), e.getValue)
      i += 1
    }
    InternalRow(buf.err, buf.n, new GenericArrayData(entries))
  }

  override def serialize(buf: MGBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(buf.err)
    out.writeLong(buf.n)
    out.writeInt(buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey); out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new MGBuffer(capacity)
    buf.err = in.readLong()
    buf.n = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.counts.put(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(term = newChildren(0))
}

object MisraGriesAgg {
  def summary(term: Column, capacity: Int): Column =
    Shims.column(MisraGriesAgg(Shims.expression(term), capacity)
      .toAggregateExpression())
}

/** The two-pass distributed heavy-hitters operator built on
  * [[MisraGriesAgg]]: sketch → candidate set → EXACT recount of the
  * candidates only → verified top-k. */
object HeavyHitters {

  /** Exact top-k most frequent analyzed tokens, computed at sketch cost:
    * pass 1 aggregates one Misra–Gries summary (≤ `capacity` counters +
    * error bound + exact n) over the token stream; pass 2 recounts ONLY
    * the ≤ capacity candidate terms exactly (an `isin` filter pushed to
    * the scan — the full vocabulary never shuffles). The result is
    * PROVEN exact or the call fails loudly: every absent term has true
    * frequency ≤ err (the MG invariant), so if the k-th candidate's
    * exact count exceeds err, no non-candidate can belong to the top-k;
    * a summary that never decremented (vocabulary ≤ capacity) has
    * err = 0 and always passes. No silent caps: an under-capacity
    * sketch raises with the measured bound rather than returning a
    * plausible-but-unverified ranking. Ties: freq DESC, term ASC.
    * Output: (rank, term, freq) — ≤ k local rows. */
  def topTermsSketched(corpus: DataFrame, k: Int, capacity: Int): DataFrame = {
    require(k >= 1 && capacity >= k,
      s"need 1 <= k <= capacity (got k=$k, capacity=$capacity)")
    val spark = corpus.sparkSession
    import spark.implicits._
    val toks = corpus.select(
      explode(Analyzer.tokens(col("text"))).as("term"))
    val s = toks.select(
      MisraGriesAgg.summary(col("term"), capacity).as("s"))
      .head().getStruct(0)
    val err = s.getLong(0)
    val cands = s.getSeq[org.apache.spark.sql.Row](2).map(_.getString(0))
    if (cands.isEmpty) {
      // a wiped-out summary (err > 0) certifies nothing — any term with
      // f ≤ err could be a heavy hitter; only a genuinely empty stream
      // may answer empty
      require(err == 0L,
        s"heavy-hitters sketch cannot certify top-$k (candidates=0, " +
          s"error bound $err) — raise capacity (=$capacity)")
      return Seq.empty[(Int, String, Long)].toDF("rank", "term", "freq")
    }
    // exact recount, candidates only (≤ capacity keys, driver-safe)
    val exact = toks.where(col("term").isInCollection(cands))
      .groupBy("term").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), asc("term"))
      .limit(k).collect()
    // certify: an absent term has f ≤ err, so a full result needs its
    // k-th count to beat err; a short result (fewer candidates than k)
    // leaves open slots any f ≥ 1 absent term could claim — only err = 0
    // (nothing was ever absent-and-nonzero) certifies that case
    val certified =
      if (exact.length == k) exact.last.getLong(1) > err
      else err == 0L
    require(certified,
      s"heavy-hitters sketch cannot certify top-$k (candidates=" +
        s"${exact.length}, error bound $err) — raise capacity (=$capacity)")
    exact.zipWithIndex.toSeq
      .map { case (r, i) => (i + 1, r.getString(0), r.getLong(1)) }
      .toDF("rank", "term", "freq")
  }
}

package graft.index

import graft.search.Bm25
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._

/** Growable primitive posting buffer — no boxing, no per-row Row objects.
  * serialize/deserialize reuse the varint codec (the partial-aggregation
  * wire format is the index's own wire format). */
final class PostingBuffer {
  var docIds: Array[Long] = new Array[Long](16)
  var tfs: Array[Int] = new Array[Int](16)
  var dls: Array[Int] = new Array[Int](16)
  var size: Int = 0
  var df: Long = -1L // per-term constant, captured from the input rows

  def append(docId: Long, tf: Int, dl: Int, dfIn: Long): Unit = {
    if (size == docIds.length) grow(size * 2)
    docIds(size) = docId; tfs(size) = tf; dls(size) = dl
    size += 1
    df = dfIn
  }

  def grow(to: Int): Unit = {
    docIds = java.util.Arrays.copyOf(docIds, to)
    tfs = java.util.Arrays.copyOf(tfs, to)
    dls = java.util.Arrays.copyOf(dls, to)
  }
}

/** E5 (SURVEY.md §2.9): posting-list builder as a TypedImperativeAggregate.
  * Replaces `sort_array(collect_list(struct(...)))` + per-block encode
  * expressions with one aggregate that accumulates postings in primitive
  * arrays and emits fully-encoded blocks at eval — no giant intermediate
  * array-of-structs, no separate sort pass over UnsafeRows, and partial
  * (map-side) aggregation still applies via serialize/merge.
  *
  * Input: (doc_id:long, tf:int, dl:int, df:long). Output: array of block
  * structs (first_doc, doc_gaps, tfs, dls, block_max_score, block_len) —
  * same layout [[PostingBlocks.build]] produces.
  */
case class PostingListAgg(
    docId: Expression, tf: Expression, dl: Expression, df: Expression,
    blockSize: Int, nDocs: Long, avgdl: Double,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PostingBuffer] {

  override def children: Seq[Expression] = Seq(docId, tf, dl, df)
  override def nullable: Boolean = false

  val blockType: StructType = StructType(Seq(
    StructField("first_doc", LongType, nullable = false),
    StructField("last_doc", LongType, nullable = false),
    StructField("doc_gaps", BinaryType, nullable = false),
    StructField("tfs", BinaryType, nullable = false),
    StructField("dls", BinaryType, nullable = false),
    StructField("block_max_score", DoubleType, nullable = false),
    StructField("block_len", IntegerType, nullable = false)))

  override def dataType: DataType = ArrayType(blockType, containsNull = false)

  override def createAggregationBuffer(): PostingBuffer = new PostingBuffer

  override def update(buf: PostingBuffer, row: InternalRow): PostingBuffer = {
    val d = docId.eval(row)
    if (d != null) {
      buf.append(d.asInstanceOf[Long],
        tf.eval(row).asInstanceOf[Int],
        dl.eval(row).asInstanceOf[Int],
        df.eval(row).asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: PostingBuffer, b: PostingBuffer): PostingBuffer = {
    if (b.size > 0) {
      if (a.size + b.size > a.docIds.length) a.grow(a.size + b.size)
      System.arraycopy(b.docIds, 0, a.docIds, a.size, b.size)
      System.arraycopy(b.tfs, 0, a.tfs, a.size, b.size)
      System.arraycopy(b.dls, 0, a.dls, a.size, b.size)
      a.size += b.size
      a.df = b.df
    }
    a
  }

  override def eval(buf: PostingBuffer): Any = {
    val n = buf.size
    // argsort by doc_id (doc ids are unique within a group)
    val order = Array.range(0, n).sortBy(buf.docIds(_))
    val nBlocks = (n + blockSize - 1) / blockSize
    val blocks = new Array[Any](nBlocks)
    var b = 0
    while (b < nBlocks) {
      val lo = b * blockSize
      val len = math.min(blockSize, n - lo)
      val ids = new Array[Long](len)
      val btf = new Array[Long](len)
      val bdl = new Array[Long](len)
      var maxScore = Double.NegativeInfinity
      var i = 0
      while (i < len) {
        val src = order(lo + i)
        ids(i) = buf.docIds(src)
        btf(i) = buf.tfs(src).toLong
        bdl(i) = buf.dls(src).toLong
        val s = Bm25.score(buf.tfs(src), buf.dls(src), buf.df, nDocs, avgdl)
        if (s > maxScore) maxScore = s
        i += 1
      }
      blocks(b) = InternalRow(
        ids(0),
        ids(len - 1),
        VarintCodec.encodeDelta(new GenericArrayData(ids)),
        VarintCodec.encode(new GenericArrayData(btf)),
        VarintCodec.encode(new GenericArrayData(bdl)),
        maxScore,
        len)
      b += 1
    }
    new GenericArrayData(blocks)
  }

  override def serialize(buf: PostingBuffer): Array[Byte] = {
    // layout: varint(size) ++ varint(df+1) ++ delta(docIds sorted? not
    // sorted — plain varints for all three streams)
    val out = new java.io.ByteArrayOutputStream()
    def writeV(value: Long): Unit = {
      var v = value
      while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    writeV(buf.size.toLong)
    writeV(buf.df + 1) // -1 sentinel → 0
    var i = 0
    while (i < buf.size) { writeV(buf.docIds(i)); i += 1 }
    i = 0
    while (i < buf.size) { writeV(buf.tfs(i).toLong); i += 1 }
    i = 0
    while (i < buf.size) { writeV(buf.dls(i).toLong); i += 1 }
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): PostingBuffer = {
    val buf = new PostingBuffer
    var pos = 0
    def readV(): Long = {
      var v = 0L; var shift = 0; var b = 0
      do { b = bytes(pos); v |= (b & 0x7fL) << shift; shift += 7; pos += 1 }
      while ((b & 0x80) != 0)
      v
    }
    val n = readV().toInt
    buf.df = readV() - 1
    buf.grow(math.max(n, 16))
    var i = 0
    while (i < n) { buf.docIds(i) = readV(); i += 1 }
    i = 0
    while (i < n) { buf.tfs(i) = readV().toInt; i += 1 }
    i = 0
    while (i < n) { buf.dls(i) = readV().toInt; i += 1 }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): PostingListAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): PostingListAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PostingListAgg =
    copy(docId = newChildren(0), tf = newChildren(1), dl = newChildren(2),
      df = newChildren(3))
}

object PostingListAgg {
  /** Column-level constructor. */
  def blocks(docId: Column, tf: Column, dl: Column, df: Column,
             blockSize: Int, nDocs: Long, avgdl: Double): Column =
    Shims.column(PostingListAgg(
      Shims.expression(docId), Shims.expression(tf), Shims.expression(dl),
      Shims.expression(df), blockSize, nDocs, avgdl)
      .toAggregateExpression())
}

package graft.index

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** LEB128/VByte posting-list codec (index compression per Zobel & Moffat,
  * ACM Computing Surveys 2006 — public knowledge; SURVEY.md §2.9 E1/E2).
  *
  * Two layouts over non-negative longs:
  *  - plain: each value as an unsigned LEB128 varint (tf / dl streams);
  *  - delta: first value raw, then successive gaps (sorted doc-id streams —
  *    gaps are small, so varints shrink them; requires ascending input).
  *
  * Static-forwarder friendly: generated Java from the codec expressions
  * calls `graft.index.VarintCodec.encodeDelta(...)` directly, so eval and
  * whole-stage codegen share one implementation.
  */
object VarintCodec {

  private def writeVarint(buf: Array[Byte], pos0: Int, value: Long): Int = {
    var v = value
    var pos = pos0
    while ((v & ~0x7fL) != 0L) {
      buf(pos) = ((v & 0x7f) | 0x80).toByte
      pos += 1
      v >>>= 7
    }
    buf(pos) = v.toByte
    pos + 1
  }

  private def encodeWith(arr: ArrayData, delta: Boolean): Array[Byte] = {
    val n = arr.numElements()
    val buf = new Array[Byte](n * 10)
    var pos = 0
    var prev = 0L
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      if (v < 0) throw new IllegalArgumentException(
        s"VarintCodec: negative value $v at $i")
      if (delta && v < prev) throw new IllegalArgumentException(
        s"VarintCodec: delta encode requires ascending input ($prev then $v)")
      pos = writeVarint(buf, pos, if (delta) v - prev else v)
      if (delta) prev = v
      i += 1
    }
    java.util.Arrays.copyOf(buf, pos)
  }

  private def decodeWith(bytes: Array[Byte], delta: Boolean): GenericArrayData = {
    // count varints (bytes with high bit clear terminate one value)
    var n = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0x80) == 0) n += 1
      i += 1
    }
    val out = new Array[Long](n)
    var pos = 0
    var prev = 0L
    var k = 0
    while (k < n) {
      var v = 0L
      var shift = 0
      var b = 0
      do {
        b = bytes(pos)
        v |= (b & 0x7fL) << shift
        shift += 7
        pos += 1
      } while ((b & 0x80) != 0)
      if (delta) { v += prev; prev = v }
      out(k) = v
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Array[Long] → varint bytes. */
  def encode(arr: ArrayData): Array[Byte] = encodeWith(arr, delta = false)

  /** varint bytes → Array[Long]. */
  def decode(bytes: Array[Byte]): GenericArrayData = decodeWith(bytes, delta = false)

  /** Ascending Array[Long] → first + delta-gap varint bytes. */
  def encodeDelta(arr: ArrayData): Array[Byte] = encodeWith(arr, delta = true)

  /** Delta-gap varint bytes → ascending Array[Long]. */
  def decodeDelta(bytes: Array[Byte]): GenericArrayData = decodeWith(bytes, delta = true)

  /** NESTED layout for per-posting position lists (the positions stream of
    * a positional postings block — same varint building blocks): for each
    * inner list, varint(length) then the ascending values delta-gap
    * encoded (first raw, then gaps). */
  def encodeNested(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    var total = 0
    val inners = new Array[ArrayData](n)
    var i = 0
    while (i < n) {
      inners(i) = arr.getArray(i)
      if (inners(i) == null) throw new IllegalArgumentException(
        s"VarintCodec: null inner array at $i")
      total += (inners(i).numElements() + 1) * 10
      i += 1
    }
    val buf = new Array[Byte](total)
    var pos = 0
    i = 0
    while (i < n) {
      val a = inners(i)
      val m = a.numElements()
      pos = writeVarint(buf, pos, m.toLong)
      var prev = 0L
      var j = 0
      while (j < m) {
        val v = a.getLong(j)
        if (v < 0) throw new IllegalArgumentException(
          s"VarintCodec: negative value $v at ($i,$j)")
        if (v < prev) throw new IllegalArgumentException(
          s"VarintCodec: nested encode requires ascending inner input ($prev then $v)")
        pos = writeVarint(buf, pos, v - prev)
        prev = v
        j += 1
      }
      i += 1
    }
    java.util.Arrays.copyOf(buf, pos)
  }

  /** Inverse of [[encodeNested]]: bytes → array<array<long>>. */
  def decodeNested(bytes: Array[Byte]): GenericArrayData = {
    var pos = 0
    def readVarint(): Long = {
      var v = 0L
      var shift = 0
      var b = 0
      do {
        b = bytes(pos)
        v |= (b & 0x7fL) << shift
        shift += 7
        pos += 1
      } while ((b & 0x80) != 0)
      v
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[GenericArrayData]
    while (pos < bytes.length) {
      val m = readVarint().toInt
      val inner = new Array[Long](m)
      var prev = 0L
      var j = 0
      while (j < m) {
        prev += readVarint()
        inner(j) = prev
        j += 1
      }
      out += new GenericArrayData(inner)
    }
    new GenericArrayData(out.toArray[Any])
  }
}

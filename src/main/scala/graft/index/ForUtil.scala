package graft.index

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** FOR (Frame-of-Reference) bit-packing codec — the THIRD posting
  * compression family next to E1/E2's delta-gap varints and
  * [[EliasFano]], and the one Lucene actually ships (`ForUtil` /
  * `ForDeltaUtil` in the default postings format since Lucene 4's
  * BlockPostingsFormat, Goldstein, Ramakrishnan & Shaft ICDE 1998 for
  * the FOR idea): values are cut into fixed 128-element blocks, each
  * block stores one bit width b = ⌈log₂(max+1)⌉ and then every value in
  * exactly b bits — decode is branch-free per block, and a run of zeros
  * (b = 0) costs ONE byte per block, which is why Lucene packs tf−1
  * streams this way. Plain FOR packs the values as-is (tf/dl sidecars);
  * FOR-delta ([[encodeDelta]]) packs first value + gaps of a
  * non-decreasing stream (doc ids), Lucene's `ForDeltaUtil`.
  *
  * Layout: varint(n) then per block `byte(b) · ⌈len·b/8⌉ bytes`, values
  * packed LSB-first at bit offset i·b ([[EliasFano]]'s bit convention);
  * the last block packs only the n mod 128 remainder. No patching (the
  * PFOR exception path Lucene adds for outliers is the documented next
  * step — same API, one more sidecar per block).
  *
  * Encode fails loudly on negative values (and, for the delta variant,
  * descending input) — a silent mis-encode would corrupt an index.
  * Static-forwarder friendly like [[VarintCodec]]: interpreted eval and
  * whole-stage codegen both call these statics. */
object ForUtil {

  final val BlockSize = 128

  private def bitsFor(max: Long): Int =
    if (max == 0L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(max)

  private def writeVarint(buf: Array[Byte], pos0: Int, value: Long): Int = {
    var v = value; var pos = pos0
    while ((v & ~0x7fL) != 0L) { buf(pos) = ((v & 0x7f) | 0x80).toByte; pos += 1; v >>>= 7 }
    buf(pos) = v.toByte; pos + 1
  }

  private def readVarint(bytes: Array[Byte], pos0: Int): (Long, Int) = {
    var v = 0L; var shift = 0; var pos = pos0; var b = 0
    do { b = bytes(pos); v |= (b & 0x7fL) << shift; shift += 7; pos += 1 } while ((b & 0x80) != 0)
    (v, pos)
  }

  /** Pack `values[from until until)` (all < 2^b) after `byteOff`,
    * LSB-first at bit offset (i−from)·b. */
  private def packBlock(values: Array[Long], from: Int, until: Int, b: Int,
                        buf: Array[Byte], byteOff: Int): Int = {
    var i = from
    while (i < until) {
      val v = values(i)
      val base = (i - from).toLong * b
      var j = 0
      while (j < b) {
        if (((v >>> j) & 1L) != 0L) {
          val bit = base + j
          val p = byteOff + (bit >>> 3).toInt
          buf(p) = (buf(p) | (1 << (bit & 7L).toInt)).toByte
        }
        j += 1
      }
      i += 1
    }
    byteOff + ((until - from).toLong * b + 7).toInt / 8
  }

  private def unpackBlock(bytes: Array[Byte], byteOff: Int, len: Int, b: Int,
                          out: Array[Long], from: Int): Int = {
    var i = 0
    while (i < len) {
      var v = 0L
      val base = i.toLong * b
      var j = 0
      while (j < b) {
        val bit = base + j
        if ((bytes(byteOff + (bit >>> 3).toInt) >>> (bit & 7L).toInt & 1) != 0)
          v |= 1L << j
        j += 1
      }
      out(from + i) = v
      i += 1
    }
    byteOff + (len.toLong * b + 7).toInt / 8
  }

  private def encodeLongs(values: Array[Long]): Array[Byte] = {
    val n = values.length
    val nBlocks = (n + BlockSize - 1) / BlockSize
    // worst case: 10-byte n varint + per block 1 width byte + 8 B/value
    val buf = new Array[Byte](10 + nBlocks + n * 8 + 8)
    var pos = writeVarint(buf, 0, n.toLong)
    var blk = 0
    while (blk < nBlocks) {
      val from = blk * BlockSize
      val until = math.min(from + BlockSize, n)
      var max = 0L; var i = from
      while (i < until) {
        val v = values(i)
        if (v < 0) throw new IllegalArgumentException(
          s"ForUtil: negative value $v at $i")
        if (v > max) max = v
        i += 1
      }
      val b = bitsFor(max)
      buf(pos) = b.toByte; pos += 1
      pos = packBlock(values, from, until, b, buf, pos)
      blk += 1
    }
    java.util.Arrays.copyOf(buf, pos)
  }

  private def decodeLongs(bytes: Array[Byte]): Array[Long] = {
    val (nL, p0) = readVarint(bytes, 0)
    val n = nL.toInt
    val out = new Array[Long](n)
    var pos = p0; var from = 0
    while (from < n) {
      val len = math.min(BlockSize, n - from)
      val b = bytes(pos) & 0xff; pos += 1
      pos = unpackBlock(bytes, pos, len, b, out, from)
      from += len
    }
    out
  }

  /** array<long> (non-negative) → FOR blocks. */
  def encode(arr: ArrayData): Array[Byte] = encodeLongs(arr.toLongArray())

  /** FOR blocks → array<long>. */
  def decode(bytes: Array[Byte]): ArrayData =
    new GenericArrayData(decodeLongs(bytes))

  /** Non-decreasing array<long> → FOR-delta blocks (first value + gaps —
    * Lucene ForDeltaUtil). */
  def encodeDelta(arr: ArrayData): Array[Byte] = {
    val vs = arr.toLongArray()
    val deltas = new Array[Long](vs.length)
    var prev = 0L; var i = 0
    while (i < vs.length) {
      val v = vs(i)
      if (v < 0) throw new IllegalArgumentException(
        s"ForUtil: negative value $v at $i")
      if (i > 0 && v < prev) throw new IllegalArgumentException(
        s"ForUtil: descending input at $i ($prev -> $v)")
      deltas(i) = if (i == 0) v else v - prev
      prev = v
      i += 1
    }
    encodeLongs(deltas)
  }

  /** FOR-delta blocks → non-decreasing array<long>. */
  def decodeDelta(bytes: Array[Byte]): ArrayData = {
    val deltas = decodeLongs(bytes)
    var i = 1
    while (i < deltas.length) { deltas(i) += deltas(i - 1); i += 1 }
    new GenericArrayData(deltas)
  }
}

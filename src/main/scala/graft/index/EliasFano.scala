package graft.index

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Elias–Fano posting-list codec (Elias JACM 1974; Fano 1971; the
  * "quasi-succinct index" revival of Vigna WSDM 2013 — public
  * algorithms; partitioned-EF per Ottaviano & Venturini SIGIR 2014 is
  * the production extension, noted below). The modern alternative to
  * E1/E2's delta-gap varints for MONOTONE sequences (doc-id streams):
  * n values below u cost n·⌈log₂(u/n)⌉ + 2n bits — within half a bit
  * per element of the information-theoretic minimum — and, unlike
  * gap codes, support random access and O(1)-amortized `nextGEQ`
  * skipping without decoding the prefix (the WAND-family traversal
  * primitive; this engine's block-max traversal gets its skipping from
  * block metadata instead, so EF here is the byte-diet option, wired as
  * a drop-in second codec rather than a replacement).
  *
  * Layout (all little-endian bit packing, LSB-first within a byte):
  *
  *   varint(n) · varint(u) · byte(l) · varint(|lower|) · lower · upper
  *
  * where u = max + 1, l = max(0, ⌊log₂(u/n)⌋) (computed on the integer
  * quotient — the canonical near-optimal split), `lower` packs each
  * value's low l bits at bit offset i·l, and `upper` is the unary
  * bucket bitvector with bit (vᵢ >> l) + i set for each i. Decode
  * inverts: the i-th set bit at position p yields high = p − i.
  *
  * Accepts any NON-DECREASING non-negative sequence (doc-id streams are
  * strictly ascending; duplicates still round-trip). Fails loudly on
  * descending input — a silent mis-encode would corrupt an index.
  *
  * Static-forwarder friendly like [[VarintCodec]]: the generated Java
  * from [[EliasFanoEncode]]/[[EliasFanoDecode]] calls these statics, so
  * interpreted eval and whole-stage codegen share one implementation.
  *
  * At fleet scale a single EF list over a 10^12-doc id space keeps
  * l ≈ log₂(u/n) bounded by the per-term density, not the corpus size;
  * the partitioned-EF refinement (chunk into 2^k-element blocks, each
  * with its own u — Ottaviano & Venturini 2014) caps the damage of one
  * dense cluster and is the documented next step, same API.
  */
object EliasFano {

  private def writeVarint(buf: Array[Byte], pos0: Int, value: Long): Int = {
    var v = value; var pos = pos0
    while ((v & ~0x7fL) != 0L) { buf(pos) = ((v & 0x7f) | 0x80).toByte; pos += 1; v >>>= 7 }
    buf(pos) = v.toByte; pos + 1
  }

  /** @return (value, next position) */
  private def readVarint(bytes: Array[Byte], pos0: Int): (Long, Int) = {
    var v = 0L; var shift = 0; var pos = pos0; var b = 0
    do { b = bytes(pos); v |= (b & 0x7fL) << shift; shift += 7; pos += 1 } while ((b & 0x80) != 0)
    (v, pos)
  }

  private def setBit(buf: Array[Byte], off: Int, bit: Long): Unit = {
    val p = off + (bit >>> 3).toInt
    buf(p) = (buf(p) | (1 << (bit & 7L).toInt)).toByte
  }

  /** Monotone non-decreasing array<long> → EF bytes. */
  def encode(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    if (n == 0) return Array[Byte](0)
    var prev = -1L
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      if (v < 0) throw new IllegalArgumentException(s"EliasFano: negative value $v at $i")
      if (v == Long.MaxValue) throw new IllegalArgumentException(
        "EliasFano: Long.MaxValue unsupported (u = max + 1 would overflow)")
      if (v < prev) throw new IllegalArgumentException(
        s"EliasFano: non-decreasing input required ($prev then $v)")
      prev = v; i += 1
    }
    val u = prev + 1
    val q = u / n
    val l = if (q <= 1) 0 else 63 - java.lang.Long.numberOfLeadingZeros(q)
    val lowerBytes = ((n.toLong * l + 7) / 8).toInt
    val upperBits = (u >>> l) + n + 1
    val upperBytes = ((upperBits + 7) / 8).toInt
    val head = new Array[Byte](10 + 10 + 1 + 5)
    var pos = writeVarint(head, 0, n)
    pos = writeVarint(head, pos, u)
    head(pos) = l.toByte; pos += 1
    pos = writeVarint(head, pos, lowerBytes)
    val out = new Array[Byte](pos + lowerBytes + upperBytes)
    System.arraycopy(head, 0, out, 0, pos)
    val lowOff = pos
    val upOff = pos + lowerBytes
    i = 0
    while (i < n) {
      val v = arr.getLong(i)
      if (l > 0) {
        // pack the low l bits at bit offset i*l, LSB-first
        var bitPos = i.toLong * l
        var rem = l
        var chunk = v & ((1L << l) - 1)
        while (rem > 0) {
          val bp = lowOff + (bitPos >>> 3).toInt
          val inByte = (bitPos & 7L).toInt
          val take = math.min(8 - inByte, rem)
          out(bp) = (out(bp) | ((chunk & ((1L << take) - 1)) << inByte)).toByte
          chunk >>>= take; bitPos += take; rem -= take
        }
      }
      setBit(out, upOff, (v >>> l) + i)
      i += 1
    }
    out
  }

  /** EF bytes → monotone array<long>. */
  def decode(bytes: Array[Byte]): GenericArrayData = {
    val (nL, p1) = readVarint(bytes, 0)
    val n = nL.toInt
    if (n == 0) return new GenericArrayData(new Array[Long](0))
    val (u, p2) = readVarint(bytes, p1)
    val l = bytes(p2).toInt
    val (lowerBytesL, p3) = readVarint(bytes, p2 + 1)
    val lowOff = p3
    val upOff = p3 + lowerBytesL.toInt
    val out = new Array[Long](n)
    var i = 0
    var p = 0L // upper bit cursor
    val upperBits = (bytes.length - upOff).toLong * 8
    while (i < n && p < upperBits) {
      val byte = bytes(upOff + (p >>> 3).toInt)
      if (((byte >> (p & 7L).toInt) & 1) != 0) {
        val high = p - i
        var low = 0L
        if (l > 0) {
          var bitPos = i.toLong * l
          var rem = l; var got = 0
          while (rem > 0) {
            val bp = lowOff + (bitPos >>> 3).toInt
            val inByte = (bitPos & 7L).toInt
            val take = math.min(8 - inByte, rem)
            low |= (((bytes(bp) >> inByte) & ((1L << take) - 1)) << got)
            got += take; bitPos += take; rem -= take
          }
        }
        out(i) = (high << l) | low
        i += 1
      }
      p += 1
    }
    if (i != n) throw new IllegalArgumentException(
      s"EliasFano: truncated upper bitvector (decoded $i of $n values, u=$u)")
    if (out(n - 1) >= u) throw new IllegalArgumentException(
      s"EliasFano: corrupt stream (decoded max ${out(n - 1)} ≥ u=$u)")
    new GenericArrayData(out)
  }
}

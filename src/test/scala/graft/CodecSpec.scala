package graft

import graft.index.{VarintCodec, codec}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class CodecSpec extends SparkSpec {
  import spark.implicits._

  def enc(xs: Seq[Long]): Array[Byte] = VarintCodec.encode(new GenericArrayData(xs.toArray))
  def dec(b: Array[Byte]): Seq[Long] = VarintCodec.decode(b).toLongArray().toSeq
  def encD(xs: Seq[Long]): Array[Byte] = VarintCodec.encodeDelta(new GenericArrayData(xs.toArray))
  def decD(b: Array[Byte]): Seq[Long] = VarintCodec.decodeDelta(b).toLongArray().toSeq

  val edges: Seq[Seq[Long]] = Seq(
    Seq.empty[Long], Seq(0L), Seq(1L), Seq(Long.MaxValue),
    Seq(0L, 0L, 0L), Seq(0L, Long.MaxValue),
    Seq(127L, 128L, 129L), Seq(16383L, 16384L),
    (0L until 1000L), Seq(1L << 31, 1L << 62))

  test("roundtrip identity on edge values (plain + delta)") {
    edges.foreach { xs =>
      assert(dec(enc(xs)) == xs, s"plain $xs")
      assert(decD(encD(xs)) == xs, s"delta $xs")
    }
  }

  test("property: decode∘encode ≡ id on random non-negative arrays") {
    val gen = Gen.listOf(Gen.chooseNum(0L, Long.MaxValue))
    (0 until 300).foreach { i =>
      val xs = gen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      assert(dec(enc(xs)) == xs)
      val sorted = xs.sorted
      assert(decD(encD(sorted)) == sorted)
    }
  }

  test("delta encoding shrinks dense sorted ids") {
    val ids = (1000000L until 1001000L)       // gaps of 1
    assert(encD(ids).length < enc(ids).length / 2)
    assert(encD(ids).length <= 3 + 999)       // 3-byte first + 1-byte gaps
  }

  test("encode rejects negatives; delta rejects descending") {
    intercept[IllegalArgumentException](enc(Seq(-1L)))
    intercept[IllegalArgumentException](encD(Seq(5L, 3L)))
  }

  test("Column expressions roundtrip inside a Spark plan (codegen path)") {
    val df = Seq(
      (1L, Seq(3L, 7L, 7L + (1L << 40))),
      (2L, Seq(0L)),
      (3L, Seq.empty[Long]))
      .toDF("id", "xs")
    val got = df
      .withColumn("plain", codec.varintDecode(codec.varintEncode(col("xs"))))
      .withColumn("delta", codec.varintDeltaDecode(codec.varintDeltaEncode(col("xs"))))
      .orderBy("id")
      .collect()
    got.foreach { r =>
      val xs = r.getSeq[Long](1)
      assert(r.getSeq[Long](2) == xs)
      assert(r.getSeq[Long](3) == xs)
    }
  }

  def encN(xss: Seq[Seq[Long]]): Array[Byte] =
    VarintCodec.encodeNested(new GenericArrayData(
      xss.map(xs => new GenericArrayData(xs.toArray): Any).toArray))
  def decN(b: Array[Byte]): Seq[Seq[Long]] = {
    val outer = VarintCodec.decodeNested(b)
    (0 until outer.numElements()).map(i => outer.getArray(i).toLongArray().toSeq)
  }

  test("nested (positions stream) roundtrip: edges + random") {
    val nestedEdges: Seq[Seq[Seq[Long]]] = Seq(
      Seq.empty,
      Seq(Seq.empty[Long]),
      Seq(Seq(0L)),
      Seq(Seq(0L, 5L, 127L, 128L), Seq.empty[Long], Seq(Long.MaxValue)),
      Seq.fill(5)(0L until 40L))
    nestedEdges.foreach(xss => assert(decN(encN(xss)) == xss, s"$xss"))
    val gen = Gen.listOf(Gen.listOf(Gen.chooseNum(0L, 1L << 40)).map(_.sorted))
    (0 until 100).foreach { i =>
      val xss = gen.apply(Gen.Parameters.default, Seed(1000L + i)).get
      assert(decN(encN(xss)) == xss)
    }
  }

  test("nested Column expressions roundtrip inside a Spark plan") {
    val df = Seq(
      (1L, Seq(Seq(0L, 3L, 9L), Seq(2L))),
      (2L, Seq(Seq.empty[Long])),
      (3L, Seq.empty[Seq[Long]]))
      .toDF("id", "xss")
    val got = df
      .withColumn("rt", codec.varintNestedDecode(codec.varintNestedEncode(col("xss"))))
      .orderBy("id").collect()
    got.foreach { r =>
      assert(r.getSeq[Seq[Long]](2) == r.getSeq[Seq[Long]](1))
    }
  }

  def encEF(xs: Seq[Long]): Array[Byte] =
    graft.index.EliasFano.encode(new GenericArrayData(xs.toArray))
  def decEF(b: Array[Byte]): Seq[Long] =
    graft.index.EliasFano.decode(b).toLongArray().toSeq

  test("Elias–Fano: roundtrip on edges + random monotone arrays") {
    val efEdges: Seq[Seq[Long]] = Seq(
      Seq.empty[Long], Seq(0L), Seq(5L), Seq(0L, 0L, 0L),
      Seq(0L, 1L, 2L, 3L), Seq(1000000L), (0L until 1000L),
      Seq(3L, 7L, 7L, 900L, 901L, 1L << 40),
      Seq(Long.MaxValue / 2), (0L until 256L).map(_ * 1000003L))
    efEdges.foreach(xs => assert(decEF(encEF(xs)) == xs, s"EF $xs"))
    (0 until 300).foreach { i =>
      val gen = Gen.listOf(Gen.chooseNum(0L, 1L << 48))
      val xs = gen.apply(Gen.Parameters.default, Seed(1000L + i)).get.sorted
      assert(decEF(encEF(xs)) == xs, s"seed $i")
    }
  }

  test("Elias–Fano: near-optimal size on dense ids, beats delta-varint") {
    // 10k ids in a 20k universe: EF ≈ n(log2(u/n)+2)/8 ≈ 3750 B;
    // delta varints cost ≥ 1 byte per gap = 10000 B
    val ids = (0L until 10000L).map(_ * 2)
    val ef = encEF(ids).length
    assert(ef < encD(ids).length, s"EF $ef vs varint ${encD(ids).length}")
    assert(ef <= 4 * 10000 / 8 + 64, s"EF $ef exceeds the succinct bound")
  }

  test("Elias–Fano: rejects negatives and descending input; corrupt fails loudly") {
    intercept[IllegalArgumentException](encEF(Seq(-1L)))
    intercept[IllegalArgumentException](encEF(Seq(5L, 3L)))
    val b = encEF(Seq(1L, 9L, 200L))
    val torn = java.util.Arrays.copyOf(b, b.length - 1)
    intercept[IllegalArgumentException](graft.index.EliasFano.decode(torn))
  }

  test("Elias–Fano Column expressions roundtrip inside a Spark plan") {
    val df = Seq(
      (1L, Seq(3L, 7L, 7L, 7L + (1L << 40))),
      (2L, Seq(0L)),
      (3L, Seq.empty[Long]))
      .toDF("id", "xs")
    val got = df
      .withColumn("ef", codec.efDecode(codec.efEncode(col("xs"))))
      .orderBy("id").collect()
    got.foreach(r => assert(r.getSeq[Long](2) == r.getSeq[Long](1)))
    // nullIntolerant: null array → null bytes
    val n = Seq((1L, Option.empty[Seq[Long]])).toDF("id", "xs")
      .withColumn("enc", codec.efEncode(col("xs"))).collect()
    assert(n(0).isNullAt(2))
  }

  def encFor(xs: Seq[Long]): Array[Byte] =
    graft.index.ForUtil.encode(new GenericArrayData(xs.toArray))
  def decFor(b: Array[Byte]): Seq[Long] =
    graft.index.ForUtil.decode(b).toLongArray().toSeq
  def encForD(xs: Seq[Long]): Array[Byte] =
    graft.index.ForUtil.encodeDelta(new GenericArrayData(xs.toArray))
  def decForD(b: Array[Byte]): Seq[Long] =
    graft.index.ForUtil.decodeDelta(b).toLongArray().toSeq

  test("FOR bit-packing: roundtrip on block edges + random arrays, both variants") {
    val edges: Seq[Seq[Long]] = Seq(
      Seq.empty[Long], Seq(0L), Seq(5L), Seq.fill(300)(0L),
      (0L until 127L), (0L until 128L), (0L until 129L), (0L until 256L),
      Seq(1L << 40, 3L, 0L, Long.MaxValue / 2),
      (0L until 1000L).map(i => i % 7))
    edges.foreach(xs => assert(decFor(encFor(xs)) == xs, s"FOR $xs"))
    edges.map(_.sorted).foreach(xs =>
      assert(decForD(encForD(xs)) == xs, s"FOR-delta $xs"))
    (0 until 300).foreach { i =>
      val gen = Gen.listOf(Gen.chooseNum(0L, 1L << 48))
      val xs = gen.apply(Gen.Parameters.default, Seed(7000L + i)).get
      assert(decFor(encFor(xs)) == xs, s"seed $i")
      assert(decForD(encForD(xs.sorted)) == xs.sorted, s"delta seed $i")
    }
  }

  test("FOR: per-block width — zero runs cost a byte/block, small ints pack tight") {
    // 1280 zeros → 10 blocks × (1 width byte) + varint(n) = 12 bytes
    assert(encFor(Seq.fill(1280)(0L)).length <= 12)
    // tf-like stream of values < 8 → 3 bits/value ≈ 3/8 byte each,
    // far under the 1 byte/value varint floor
    val tfs = (0 until 1024).map(i => (i % 7 + 1).toLong)
    assert(encFor(tfs).length < enc(tfs).length)
    assert(encFor(tfs).length <= 1024 * 3 / 8 + 8 + 10)
    // a single outlier widens ONLY its own block (no patching, pinned)
    val spiked = (0L until 256L).map(i => if (i == 255) 1L << 30 else 1L)
    val flat = (0L until 256L).map(_ => 1L)
    assert(encFor(spiked).length - encFor(flat).length <= 31 * 128 / 8 + 8)
  }

  test("FOR: rejects negatives and descending delta input") {
    intercept[IllegalArgumentException](encFor(Seq(-1L)))
    intercept[IllegalArgumentException](encForD(Seq(5L, 3L)))
    intercept[IllegalArgumentException](encForD(Seq(-2L, 3L)))
  }

  test("FOR Column expressions roundtrip inside a Spark plan") {
    val df = Seq(
      (1L, Seq(3L, 7L, 7L, 7L + (1L << 40))),
      (2L, Seq(0L)),
      (3L, Seq.empty[Long]),
      (4L, (0L until 200L).toSeq))
      .toDF("id", "xs")
    val got = df
      .withColumn("f", codec.forDecode(codec.forEncode(col("xs"))))
      .withColumn("fd", codec.forDeltaDecode(codec.forDeltaEncode(col("xs"))))
      .orderBy("id").collect()
    got.foreach { r =>
      assert(r.getSeq[Long](2) == r.getSeq[Long](1))
      assert(r.getSeq[Long](3) == r.getSeq[Long](1))
    }
    val n = Seq((1L, Option.empty[Seq[Long]])).toDF("id", "xs")
      .withColumn("enc", codec.forEncode(col("xs"))).collect()
    assert(n(0).isNullAt(2))
  }

  test("null input yields null (nullIntolerant)") {
    val df = Seq((1L, Option.empty[Seq[Long]]), (2L, Some(Seq(1L, 2L))))
      .toDF("id", "xs")
    val got = df.withColumn("enc", codec.varintEncode(col("xs")))
      .orderBy("id").collect()
    assert(got(0).isNullAt(2))
    assert(!got(1).isNullAt(2))
  }
}

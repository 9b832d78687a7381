package graft

import graft.ops.{HeavyHitters, MGBuffer, MisraGriesAgg}
import org.apache.spark.sql.functions._

/** Misra–Gries heavy hitters: certified-exact top-k vs brute force under
  * vocabularies larger than the sketch capacity, the c ≤ f ≤ c + err
  * summary invariant across merges, and the loud under-capacity
  * failure. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Skewed corpus: 20 heavy terms (freq ∝ 400/i) over a 300-term tail
    * vocabulary, shuffled deterministically across 8 partitions. */
  def skewed(): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(42)
    val toks = (1 to 20).flatMap(i => Seq.fill(400 / i)(s"heavy$i")) ++
      (1 to 300).flatMap(i => Seq.fill(2)(s"tail$i"))
    val docs = rnd.shuffle(toks).grouped(25).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
    docs.toDF("doc_id", "text").repartition(8)
  }

  test("certified-exact top-k ≡ brute force with vocab >> capacity") {
    val docs = skewed()
    val got = HeavyHitters.topTermsSketched(docs, 10, 64)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    val brute = docs
      .select(explode(graft.analysis.Analyzer.tokens(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("f"))
      .orderBy(desc("f"), asc("t")).limit(10).collect()
      .zipWithIndex.map { case (r, i) => (i + 1, r.getString(0), r.getLong(1)) }
      .toSeq
    assert(got == brute && got.size == 10)
    assert(got.head._2 == "heavy1" && got.head._3 == 400L)
  }

  test("summary invariant: c(t) <= f(t) <= c(t) + err after merges") {
    // drive the buffer machinery directly with an adversarial stream
    val rnd = new scala.util.Random(7)
    val stream = rnd.shuffle(
      (1 to 5).flatMap(i => Seq.fill(200)(s"h$i")) ++
        (1 to 400).map(i => s"t$i"))
    val truth = stream.groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    // three partial buffers merged pairwise (the map-side + reduce shape)
    val parts = stream.grouped((stream.size + 2) / 3).toSeq
    val agg = MisraGriesAgg(null, 16)
    val bufs = parts.map { p =>
      val b = new MGBuffer(16); p.foreach(b.add); b
    }
    val merged = bufs.reduce(agg.merge)
    assert(merged.counts.size <= 16)
    assert(merged.n == stream.size.toLong)
    truth.foreach { case (t, f) =>
      val c = merged.counts.getOrDefault(t, 0L)
      assert(c <= f && f <= c + merged.err, s"term $t: c=$c f=$f err=${merged.err}")
    }
    // every heavy term (f > n/(cap+1)) must survive as a candidate
    val eps = stream.size.toDouble / 17
    truth.filter(_._2 > eps).foreach { case (t, _) =>
      assert(merged.counts.containsKey(t), s"heavy term $t evicted")
    }
  }

  test("under-capacity sketch fails loudly instead of guessing") {
    // uniform vocabulary far beyond capacity: nothing is certifiable
    val docs = (1 to 400).map(i => (i.toLong, s"u$i v$i w$i"))
      .toDF("doc_id", "text").repartition(8)
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.topTermsSketched(docs, 10, 16)
    }
    assert(e.getMessage.contains("cannot certify"))
  }

  test("k larger than the vocabulary returns the whole (exact) ranking") {
    val docs = Seq((0L, "a a a b b c")).toDF("doc_id", "text")
    val got = HeavyHitters.topTermsSketched(docs, 10, 64)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1, "a", 3L), (2, "b", 2L), (3, "c", 1L)))
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ordinal (distributed positional ids) and Multimodal (stub-codec
  * pipeline) operator specs.
  */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("withOrdinal assigns contiguous 0-based ids in order, across partitions") {
    val df = Seq(30, 10, 50, 20, 40).toDF("v").repartition(3)
    val out = Ordinal.withOrdinal(df, Seq(col("v"))).orderBy("ord")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(out == Seq((10, 0L), (20, 1L), (30, 2L), (40, 3L), (50, 4L)))
  }

  test("slice and iloc agree with a sorted collect") {
    val df = (1 to 100).toDF("v").repartition(5)
    val sliced = Ordinal.slice(df, Seq(col("v")), 10, 13)
      .orderBy("ord").collect().map(_.getInt(0)).toSeq
    assert(sliced == Seq(11, 12, 13))
    assert(Ordinal.iloc(df, Seq(col("v")), 0).head().getInt(0) == 1)
    assert(Ordinal.iloc(df, Seq(col("v")), 99).head().getInt(0) == 100)
  }

  test("asOf attaches latest right row at-or-before, null when none") {
    import java.sql.Timestamp
    def t(m: Int) = new Timestamp(m * 60000L)
    val trades = Seq((1L, 100L, t(10), 5.0), (2L, 100L, t(20), 6.0), (3L, 200L, t(5), 7.0))
      .toDF("id", "u", "ts", "tv")
    val quotes = Seq((100L, t(8), 1.0), (100L, t(15), 2.0), (100L, t(20), 3.0))
      .toDF("u", "ts", "qv")
    val out = AsOfJoin.asOf(trades, quotes, Seq("u"), "ts", Seq("qv"), rightTsAs = "qts")
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Any]("qv"), r.getAs[Any]("qts")))
    assert(out(0) == ((1L, 1.0, t(8))))   // latest quote at t8
    assert(out(1) == ((2L, 3.0, t(20)))) // equal-ts quote matches (inclusive)
    assert(out(2)._2 == null && out(2)._3 == null) // no quote for user 200
  }

  test("multimodal decode is deterministic and typed") {
    val media = Seq(
      Multimodal.MediaRow(1L, "image", "hello world".getBytes("UTF-8")),
      Multimodal.MediaRow(2L, "audio", "abcdef".getBytes("UTF-8")),
      Multimodal.MediaRow(3L, "video", ("x" * 1000).getBytes("UTF-8"))).toDS()
    val meta = Multimodal.decodeMeta(media).collect().sortBy(_.id)
    assert(meta.map(_.nBytes).toSeq == Seq(11L, 6L, 1000L))
    assert(meta(1).sampleRate == 16000 && meta(0).sampleRate == 0)
    assert(meta(2).nFrames == 1 + 1000 % 300)
    // determinism: same input → same decoded values
    val again = Multimodal.decodeMeta(media).collect().sortBy(_.id)
    assert(meta.toSeq == again.toSeq)
  }

  test("multimodal features are an L1-normalized histogram") {
    val media = Seq(Multimodal.MediaRow(1L, "image", "aabb".getBytes("UTF-8"))).toDS()
    val f = Multimodal.extractFeatures(media).head().features
    assert(f.length == Multimodal.FeatureDim)
    assert(math.abs(f.sum - 1.0f) < 1e-6)
  }

  test("resize nearest-neighbor resamples to the target byte count") {
    val bytes = (0 until 100).map(_.toByte).toArray
    val media = Seq(Multimodal.MediaRow(1L, "image", bytes)).toDS()
    val out = Multimodal.resize(media, 10).head().payload
    assert(out.length == 10)
    // out(i) = in(floor(i * 100 / 10)) = in(10 * i)
    assert(out.toSeq == (0 until 10).map(i => (10 * i).toByte))
    // upsample: repeats neighbors, still exact length
    val up = Multimodal.resize(Seq(Multimodal.MediaRow(2L, "image",
      Array[Byte](1, 2))).toDS(), 5).head().payload
    assert(up.toSeq == Seq[Byte](1, 1, 1, 2, 2))
  }

  test("frame sampling keeps every k-th block") {
    val media = Seq(Multimodal.MediaRow(1L, "video", new Array[Byte](1024))).toDS()
    val out = Multimodal.sampleFrames(media, 2).head()
    assert(out.payload.length == 512) // blocks 0 and 2 of 4×256
  }

  test("perceptual hash: blocked-mean bits, empty-payload zero, edit locality") {
    import Multimodal.StubCodec.perceptualHash
    assert(perceptualHash(Array.emptyByteArray) == 0L)
    // uniform payload: every block mean equals the global mean, so the
    // cross-multiply ≥ sets every non-empty block's bit. 96 bytes → all
    // 48 blocks non-empty → all 48 bits set.
    assert(perceptualHash(Array.fill(96)(7.toByte)) == (1L << 48) - 1)
    // shorter than 48 bytes: blocks [lo,hi) with lo==hi contribute 0 —
    // exactly n bits can be set for an n-byte uniform payload
    assert(java.lang.Long.bitCount(perceptualHash(Array.fill(10)(7.toByte))) == 10)
    // hand-check 2 blocks' worth of a 96-byte ramp: total=sum(0..95),
    // first block {0,1} mean far below global mean → bit 0 clear; last
    // block {94,95} far above → bit 47 set
    val ramp = Array.tabulate(96)(_.toByte)
    val h = perceptualHash(ramp)
    assert((h & 1L) == 0L && (h >>> 47) == 1L)
    // edit locality (the property the banded join exploits): flipping a
    // couple of bytes moves few block means
    val edited = ramp.clone(); edited(10) = 90.toByte; edited(40) = 90.toByte
    assert(java.lang.Long.bitCount(h ^ perceptualHash(edited)) <= 6)
  }

  test("banded perceptual dedup equals brute-force hamming pairs (pigeonhole)") {
    // run the registered query on the smallest corpus and rebuild the
    // brute-force answer from the same hashes — the 8×6-bit pigeonhole
    // must lose nothing at radius 7
    val dir = "/root/testdata/sf0.001"
    val banded = graft.queries.MultimodalQ.qMultimodalDedup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val hashes = Multimodal.perceptualHashes(Multimodal.syntheticMedia(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (a, ha) <- hashes; (b, hb) <- hashes
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= 7
    } yield (a, b, java.lang.Long.bitCount(ha ^ hb))).sortBy(p => (p._1, p._2)).toSeq
    assert(banded == brute)
  }
}

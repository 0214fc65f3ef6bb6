package graft.multimodal

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Multimodal plumbing: schema contract, partition-local decode batch
  * shape, frame sampling and resize — with the stub decoder standing in
  * for a codec (deterministic, so results are assertable). */
class MultimodalSpec extends SparkTestBase {

  private def mediaDf = {
    val rows = Seq(
      Row(1L, "image", "abcdefgh".getBytes("UTF-8"), "s1"),
      Row(2L, "video", ("x" * 100).getBytes("UTF-8"), "s2"),
      Row(3L, "audio", Array[Byte](), "s3"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
  }

  test("decodeFeatures: schema contract + deterministic stub features") {
    val out = Multimodal.decodeFeatures(mediaDf)
    assert(out.schema == Multimodal.featureSchema)
    val byId = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getLong(1) == 8L) // n_bytes
    assert(byId(3L).getLong(1) == 0L) // empty media decodes, not crashes
    // deterministic: two runs produce identical feature vectors
    val again = Multimodal.decodeFeatures(mediaDf).collect().map(r => r.getLong(0) -> r.getSeq[Double](5)).toMap
    val first = out.collect().map(r => r.getLong(0) -> r.getSeq[Double](5)).toMap
    assert(first == again)
    // exact-arithmetic contract: integer band sums / double L1 norm
    // ("abcdefgh": one byte per band, total 804)
    val expected = "abcdefgh".getBytes("UTF-8").map(_.toDouble / 804d).toSeq
    assert(first(1L) == expected)
  }

  test("decode is a narrow transformation (partition count preserved, no shuffle)") {
    val out = Multimodal.decodeFeatures(mediaDf)
    assert(out.rdd.getNumPartitions == mediaDf.rdd.getNumPartitions)
  }

  test("sampleFrames slices fixed-size frames and honors stride") {
    import spark.implicits._
    val frames = Multimodal.sampleFrames(mediaDf.filter($"media_id" === 2L), frameBytes = 10, stride = 2)
    val nos = frames.select($"frame_no").collect().map(_.getInt(0)).sorted.toSeq
    assert(nos == Seq(0, 2, 4, 6, 8)) // 100 bytes → 10 frames → stride 2 keeps 5
    val lens = frames.select(octet_length($"frame")).collect().map(_.getInt(0)).toSet
    assert(lens == Set(10))
  }

  test("resize truncates frames to 1/factor of the bytes") {
    import spark.implicits._
    val frames = Multimodal.sampleFrames(mediaDf.filter($"media_id" === 2L), 10, 1)
    val small = Multimodal.resize(frames, 5)
    val lens = small.select(octet_length($"frame")).collect().map(_.getInt(0)).toSet
    assert(lens == Set(2))
  }

  test("silenceOf: planted silent stretch is gated, counted, and its run measured") {
    import spark.implicits._
    // 32-byte frames. loud = letters (byte 120 > gate 96); silent =
    // spaces (byte 32 < gate). media 10: loud, silent, silent, loud →
    // longest run 2, speech 500000 ppm. media 11: all loud. media 12:
    // all silent (one frame). media 13: mixed WITHIN one frame — mean
    // decides (16 letters + 16 spaces → mean 76 < 96 → silent).
    val loud = "x" * 32
    val quiet = " " * 32
    val rows = Seq(
      10L -> (loud + quiet + quiet + loud),
      11L -> (loud + loud),
      12L -> quiet,
      13L -> ("x" * 16 + " " * 16))
    val media = rows.toDF("media_id", "text")
      .select($"media_id", encode($"text", "UTF-8").as("media"))
    val got = MultimodalQueries.silenceOf(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(10L) == ((4L, 2L, 500000L, 2L)))
    assert(got(11L) == ((2L, 0L, 1000000L, 0L)))
    assert(got(12L) == ((1L, 1L, 0L, 1L)))
    assert(got(13L) == ((1L, 1L, 0L, 1L)))
  }

  test("silenceOf: two separated silent runs report the longer one") {
    import spark.implicits._
    val loud = "x" * 32
    val quiet = " " * 32
    // silent, loud, silent, silent, silent, loud → longest 3, n_silent 4
    val text = quiet + loud + quiet + quiet + quiet + loud
    val media = Seq(20L -> text).toDF("media_id", "text")
      .select($"media_id", encode($"text", "UTF-8").as("media"))
    val r = MultimodalQueries.silenceOf(media).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(4)) == ((6L, 4L, 3L)))
  }

  test("frameDedup flags every frame of a re-upload; a byte shift shares nothing (offset-aligned)") {
    import spark.implicits._
    // 40 bytes → 4 DISTINCT frames at frameBytes = 10
    val payload = "frame-one." + "frame-two." + "framethree" + "frame-four"
    val shifted = "X" + payload // same content one byte later
    val media = Seq(
      1L -> payload, 2L -> payload, // exact re-upload
      3L -> shifted,
      4L -> "completely different bytes here!!").toDF("media_id", "text")
      .select($"media_id", encode($"text", "UTF-8").as("media"))
    val dup = MultimodalQueries.frameDedupOf(media, frameBytes = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the re-upload pair shares all 4 frames, canonical = lowest id,
    // each duplicated frame digest seen exactly twice
    assert(dup.length == 4, s"expected the 4 shared frames, got ${dup.toSeq}")
    assert(dup.forall { case (_, nMedia, nOcc, canon) => nMedia == 2 && nOcc == 2 && canon == 1L },
      dup.toSeq.toString)
  }

  test("frameNearDup catches a retouched re-encode (1 aHash bit) that exact digests miss") {
    import spark.implicits._
    // one 64-byte frame of '!' (33, far below mean) and 'z' (122, far
    // above): flipping a single '!' to 'z' moves the frame total by 89
    // but leaves every OTHER byte on its side of the mean, so exactly
    // ONE aHash bit flips — a planted Hamming-1 near-dup whose md5
    // differs (q108 finds nothing). Media 5 is all-'a' (every byte ==
    // the mean, all bits 0): its b0 = 0 COLLIDES with the base frame's
    // all-'!' band, making it a banded candidate that the Hamming
    // verify must then reject (32 bits apart).
    val base = ("!" * 16) + ("z" * 16) + ("!" * 16) + ("z" * 16)
    val touched = "z" + base.substring(1)
    val media = Seq(
      1L -> base, 2L -> touched,
      3L -> base, // exact re-upload of 1
      5L -> ("a" * 64)).toDF("media_id", "text")
      .select($"media_id", encode($"text", "UTF-8").as("media"))
    val got = MultimodalQueries.frameNearDupOf(media)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // (1,2): the near pair, 1 frame pair, hamming 1 (counted as near);
    // (1,3): exact pair, hamming 0; (2,3): also hamming 1
    assert(got.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"pairs: $got — media 5 must be rejected by the verify, near pair must survive")
    assert(got((1L, 2L)) == (1L, 1L, 1L), s"near pair mis-scored: $got")
    assert(got((1L, 3L)) == (1L, 0L, 0L), s"exact pair mis-scored: $got")
    // and the exact-digest path indeed misses the retouched pair
    val exact = MultimodalQueries.frameDedupOf(media, frameBytes = 64)
      .collect().map(_.getLong(3)).toSet
    assert(!exact.contains(2L) || exact == Set(1L),
      s"q108-style exact dedup should pair only 1 and 3: $exact")
    graft.core.ScratchCache.drain()
  }

  test("media roll-up: matched-frame fraction drives the pair verdict, max-side for containment") {
    import spark.implicits._
    // Frame patterns from four 16-bit band ints: byte 16b+j is high
    // ('z') iff bit j of band b is set, low ('!') otherwise — the aHash
    // recovers exactly those band values (mean sits between 33 and
    // 122). Patterns pairwise differ in >3 bits, so only identical
    // frames verify as matches.
    def frame(b: Int*) : String =
      (0 until 64).map { p =>
        if (((b(p / 16) >> (p % 16)) & 1) == 1) 'z' else '!'
      }.mkString
    val A = frame(0xFFFF, 0xFFFF, 0, 0)
    val B = frame(0, 0, 0xFFFF, 0xFFFF)
    val C = frame(0xFFFF, 0, 0xFFFF, 0)
    val D = frame(0, 0xFFFF, 0, 0xFFFF)
    val X = frame(0x1111, 0x2222, 0x3333, 0x4444)
    val Y = frame(0x5555, 0x6666, 0x7777, 0x0888)
    val Z = frame(0x0123, 0x4567, 0x0abc, 0x0def)
    val media = Seq(
      1L -> (A + B + C + D), // full re-upload pair with 2
      2L -> (A + B + C + D),
      3L -> (A + X + Y + Z), // shares 1/4 frames with 1 and 2
      4L -> A)               // contained in 1/2/3: 1/1 matched on its side
      .toDF("media_id", "text")
      .select($"media_id", encode($"text", "UTF-8").as("media"))
    val got = MultimodalQueries.mediaNearDupRollupOf(media)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))).toMap
    // (1,2): 4/4 both sides -> verdict 1; (1,3)/(2,3): 1/4 both -> 0;
    // (1,4)/(2,4)/(3,4): containment — 1/4 vs 1/1 -> max side flags 1
    assert(got.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L), (3L, 4L)),
      s"pair set: ${got.keySet}")
    assert(got((1L, 2L)) == (4L, 4L, 1000000L, 1000000L, 1L), s"full dup: ${got((1L, 2L))}")
    assert(got((1L, 3L)) == (1L, 1L, 250000L, 250000L, 0L), s"sub-threshold: ${got((1L, 3L))}")
    assert(got((1L, 4L)) == (1L, 1L, 250000L, 1000000L, 1L), s"containment: ${got((1L, 4L))}")
    graft.core.ScratchCache.drain()
  }

  test("byte accessors are exact for non-ASCII media bytes (bytes >= 0x80, i.e. real media)") {
    import spark.implicits._
    // A UTF-8 decode (CAST(frame AS STRING)) mangles every byte >= 0x80
    // into replacement-char garbage; the hex-pair accessor must read
    // the raw values. VAD: 200-valued bytes are loud (> gate 96),
    // 16-valued bytes silent → loud, silent, silent = longest run 2.
    val loud = Array.fill[Byte](32)(0xC8.toByte)  // 200
    val quiet = Array.fill[Byte](32)(0x10.toByte) // 16
    val vad = Seq((1L, loud ++ quiet ++ quiet)).toDF("media_id", "media")
    val r = MultimodalQueries.silenceOf(vad).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(4)) == ((3L, 2L, 2L)),
      s"non-ASCII VAD mis-read: ${r.toSeq}")
    graft.core.ScratchCache.drain()
    // aHash: identical frames of 144/240-valued bytes (mean 192) must
    // fingerprint identically and pair at hamming 0
    val frame = Array.fill[Byte](32)(0x90.toByte) ++ Array.fill[Byte](32)(0xF0.toByte)
    val nd = Seq((1L, frame), (2L, frame)).toDF("media_id", "media")
    val pairs = MultimodalQueries.frameNearDupOf(nd).collect()
    assert(pairs.length == 1 && pairs.head.getLong(4) == 0L,
      s"identical high-byte frames must pair at hamming 0: ${pairs.map(_.toSeq).toSeq}")
    graft.core.ScratchCache.drain()
  }

  test("sceneCutsOf: a planted energy jump cuts once; steady media never cuts") {
    import spark.implicits._
    // 32-byte frames; threshold = 16·32 = 512 energy delta.
    // media 30: two 'a' (97) frames then two 'z' (122) frames — the
    //   jump is (122−97)·32 = 800 ≥ 512 → ONE cut at frame 2, the
    //   z→z and a→a deltas are 0.
    // media 31: constant → 0 cuts, first_cut −1.
    // media 32: a ramp below threshold ('a'×32 then 'k'×32: Δ=320) →
    //   0 cuts, max_delta 320 — the near-miss the threshold rejects.
    // media 33: 40 bytes — the trailing 8-byte partial is DROPPED, so
    //   one full frame, no deltas.
    val rows = Seq(
      30L -> ("a" * 64 + "z" * 64),
      31L -> ("m" * 96),
      32L -> ("a" * 32 + "k" * 32),
      33L -> ("q" * 40))
    val media = rows.toDF("media_id", "text")
      .select($"media_id", encode($"text", "UTF-8").as("media"))
    val got = MultimodalQueries.sceneCutsOf(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(30L) == ((4L, 1L, 800L, 2L)), s"got ${got(30L)}")
    assert(got(31L) == ((3L, 0L, 0L, -1L)))
    assert(got(32L) == ((2L, 0L, 320L, -1L)))
    assert(got(33L) == ((1L, 0L, 0L, -1L)))
    graft.core.ScratchCache.drain()
  }
}

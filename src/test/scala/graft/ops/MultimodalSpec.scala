package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val blobs = Multimodal.blobTable(Tables.documents(spark, sfDir))

  test("blob table schema: binary payload + typed metadata") {
    val sch = blobs.schema
    assert(sch("content").dataType.typeName == "binary")
    assert(sch("media_id").dataType.typeName == "long")
    val types = blobs.select("media_type").distinct().collect().map(_.getString(0)).toSet
    assert(types.subsetOf(Set("image/jpeg", "audio/wav", "video/mp4")))
  }

  test("decode emits the typed contract deterministically, preserving partitioning") {
    val d1 = Multimodal.decode(blobs).collect().map(d => d.media_id -> d.meta).toMap
    val d2 = Multimodal.decode(blobs.repartition(7)).collect().map(d => d.media_id -> d.meta).toMap
    assert(d1 == d2) // partition layout must not change results
    assert(d1.size == blobs.count())
    d1.values.foreach { m =>
      assert(m.width >= 64 && m.width < 1024 && m.channels == 3)
    }
    val feats = Multimodal.decode(blobs).head().features
    assert(feats.length == 8)
    // narrow plan: no exchange in the decode stage
    val plan = Multimodal.decode(blobs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("frame sampling fans out rows only for video payloads") {
    val frames = Multimodal.sampleFrames(blobs)
    val vids = blobs.filter(col("media_type") === "video/mp4").count()
    assert(frames.select("media_id").distinct().count() == vids)
    assert(frames.collect().forall(f => f.content.length <= 256))
  }

  test("resize rewrites metadata, keeps ids/features") {
    val d = Multimodal.decode(blobs)
    val r = Multimodal.resize(d, 224, 224).collect()
    assert(r.forall(x => x.meta.width == 224 && x.meta.height == 224))
    assert(r.map(_.media_id).sorted.toSeq ==
      d.collect().map(_.media_id).sorted.toSeq)
  }

  test("real header parse: PNG/JPEG/MP4 dims and WAV rates round-trip the synthesis recipe (r9/r10)") {
    val synth = Multimodal.synthMediaBlobs(Tables.documents(spark, sfDir))
    val got = Multimodal.decode(synth).collect().map(d => d.media_id -> d.meta).toMap
    assert(got.nonEmpty)
    got.foreach { case (id, m) =>
      math.floorMod(id, 6L) match {
        case 2L =>
          val (rate, ch) = Multimodal.synthAudio(id)
          assert(m.format == "wav" && m.width == 0 && m.height == 0,
            s"id $id: expected wav 0x0, got ${m.format} ${m.width}x${m.height}")
          assert(m.sample_rate == rate && m.channels == ch,
            s"id $id: parsed ${m.sample_rate}Hz x${m.channels}, synthesized ${rate}Hz x$ch")
        case 5L =>
          val (w, h) = Multimodal.synthDims(id)
          assert(m.format == "mp4" && m.width == w && m.height == h && m.channels == 0,
            s"id $id: expected mp4 ${w}x$h, got ${m.format} ${m.width}x${m.height}")
          assert(m.sample_rate == Multimodal.synthVideo(id),
            s"id $id: parsed timescale ${m.sample_rate}, synthesized ${Multimodal.synthVideo(id)}")
        case _ =>
          val (w, h) = Multimodal.synthDims(id)
          assert(m.width == w && m.height == h,
            s"id $id: parsed ${m.width}x${m.height}, synthesized ${w}x$h")
          assert(m.sample_rate == 0)
          if (id % 2 == 0) {
            assert(m.format == "png")
            assert(m.channels == Array(1, 3, 4)(math.floorMod(id, 3L).toInt))
          } else {
            assert(m.format == "jpeg")
            assert(m.channels == (if (math.floorMod(id, 4L) == 1L) 1 else 3))
          }
      }
    }
    // both SOF0 and SOF2 variants and the segment-skip path must have
    // been exercised (ids mod 8 spread ensures both marker branches);
    // all six standard rates plus both channel counts for wav; all
    // four standard timescales for mp4
    def img(id: Long) = math.floorMod(id, 6L) != 2L && math.floorMod(id, 6L) != 5L
    assert(got.keys.exists(id => img(id) && id % 2 == 1 && math.floorMod(id, 8L) < 4) &&
      got.keys.exists(id => img(id) && id % 2 == 1 && math.floorMod(id, 8L) >= 4))
    val wavs = got.collect { case (id, m) if math.floorMod(id, 6L) == 2L => m }
    assert(wavs.map(_.sample_rate).toSet.size == 6)
    assert(wavs.map(_.channels).toSet == Set(1, 2))
    val mp4s = got.collect { case (id, m) if math.floorMod(id, 6L) == 5L => m }
    assert(mp4s.map(_.sample_rate).toSet == Set(600, 1000, 90000, 30000))
  }

  test("parseHeader: JPEG fill-byte padding, truncation, and corruption handling (r9)") {
    import Multimodal.{parseHeader, MediaMeta}
    // hand-built JPEG: SOI, FF-fill padding, then SOF0 120x80, 3 comps
    val jpeg = Array(0xFF, 0xD8, 0xFF, 0xFF, 0xFF, 0xC0, 0x00, 0x11,
      0x08, 0x00, 0x50, 0x00, 0x78, 0x03,
      0x01, 0x11, 0x00, 0x02, 0x11, 0x00, 0x03, 0x11, 0x00).map(_.toByte)
    assert(parseHeader(jpeg).contains(MediaMeta(120, 80, 3, "jpeg")))
    // truncated before the SOF payload: no phantom metadata
    assert(parseHeader(jpeg.take(7)).isEmpty)
    // non-marker garbage where a marker must be: corrupt, not parsed
    assert(parseHeader(Array(0xFF, 0xD8, 0x00, 0x01).map(_.toByte)).isEmpty)
    // PNG with a bad color type is rejected rather than mis-channeled
    val (w, h) = Multimodal.synthDims(4L)
    val png = Multimodal.synthPng(4L, Array.emptyByteArray)
    assert(parseHeader(png).contains(
      MediaMeta(w, h, Array(1, 3, 4)(math.floorMod(4L, 3L).toInt), "png")))
    val badColor = png.clone(); badColor(25) = 7.toByte
    assert(parseHeader(badColor).isEmpty)
    // arbitrary text payload: stub fallback territory
    assert(parseHeader("just some text".getBytes).isEmpty)
    // JPEG segment length below 2 (the field counts itself) is corrupt:
    // trusting it would rescan payload bytes as markers (ADVICE r9) —
    // here a COM segment claiming length 0 is followed by bytes that
    // would misparse as a SOF0 if the scanner re-entered the payload
    val zeroLen = Array(0xFF, 0xD8, 0xFF, 0xFE, 0x00, 0x00,
      0xFF, 0xC0, 0x00, 0x11, 0x08, 0x00, 0x50, 0x00, 0x78, 0x03).map(_.toByte)
    assert(parseHeader(zeroLen).isEmpty)
  }

  test("parseHeader: MP4 box walk, truncation, and corruption handling (r10)") {
    import Multimodal.{parseHeader, MediaMeta}
    val id = 17L // idx (17/6)%4 = 2 -> timescale 90000
    val (w, h) = Multimodal.synthDims(id)
    val mp4 = Multimodal.synthMp4(id, "payload".getBytes)
    assert(parseHeader(mp4).contains(MediaMeta(w, h, 0, "mp4", 90000)))
    // truncated before moov completes: no phantom metadata
    assert(parseHeader(mp4.take(40)).isEmpty)
    // a box size below the 8-byte header is corrupt, not a scan loop
    val badSize = mp4.clone()
    badSize(0) = 0; badSize(1) = 0; badSize(2) = 0; badSize(3) = 3
    assert(parseHeader(badSize).isEmpty)
    // v1 (64-bit-time) tkhd is out of contract: None, never misread
    val tkhdAt = mp4.indexOfSlice("tkhd".getBytes("US-ASCII"))
    val v1 = mp4.clone(); v1(tkhdAt + 4) = 1.toByte
    assert(parseHeader(v1).isEmpty)
    // zero timescale (corrupt mvhd) rejected
    val mvhdAt = mp4.indexOfSlice("mvhd".getBytes("US-ASCII"))
    val zeroTs = mp4.clone()
    (0 until 4).foreach(i => zeroTs(mvhdAt + 4 + 12 + i) = 0.toByte)
    assert(parseHeader(zeroTs).isEmpty)
    // an mp4 whose moov has no trak/tkhd: None
    val ftypOnly = mp4.take(16) // just the ftyp box
    assert(parseHeader(ftypOnly).isEmpty)
  }

  test("parseHeader: WAV RIFF chunk scan, truncation, and corruption handling (r10)") {
    import Multimodal.{parseHeader, MediaMeta}
    val wav = Multimodal.synthWav(8L, "payload".getBytes) // id 8: rate idx (8/6)%6=1, ch 1+(8/6)%2=2
    assert(parseHeader(wav).contains(MediaMeta(0, 0, 2, "wav", 11025)))
    val mono = Multimodal.synthWav(2L, Array.emptyByteArray) // (2/6)=0 -> 8000 Hz, ch 1
    assert(parseHeader(mono).contains(MediaMeta(0, 0, 1, "wav", 8000)))
    // truncated mid-fmt: no phantom metadata
    assert(parseHeader(wav.take(30)).isEmpty)
    // a RIFF that never reaches a fmt chunk
    assert(parseHeader(
      "RIFF".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++
        "WAVE".getBytes("US-ASCII")).isEmpty)
    // fmt chunk claiming an undersized body is corrupt, not parsed
    val badFmt = wav.clone()
    val fmtAt = wav.indexOfSlice("fmt ".getBytes("US-ASCII"))
    badFmt(fmtAt + 4) = 8.toByte // size 8 < 16
    assert(parseHeader(badFmt).isEmpty)
    // zero channels rejected
    val zeroCh = wav.clone(); zeroCh(fmtAt + 10) = 0.toByte; zeroCh(fmtAt + 11) = 0.toByte
    assert(parseHeader(zeroCh).isEmpty)
  }
}

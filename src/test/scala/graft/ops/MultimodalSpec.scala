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

  test("real header parse: PNG IHDR and JPEG SOF dims round-trip the synthesis recipe (r9)") {
    val synth = Multimodal.synthImageBlobs(Tables.documents(spark, sfDir))
    val got = Multimodal.decode(synth).collect().map(d => d.media_id -> d.meta).toMap
    assert(got.nonEmpty)
    got.foreach { case (id, m) =>
      val (w, h) = Multimodal.synthDims(id)
      assert(m.width == w && m.height == h,
        s"id $id: parsed ${m.width}x${m.height}, synthesized ${w}x$h")
      if (id % 2 == 0) {
        assert(m.format == "png")
        assert(m.channels == Array(1, 3, 4)(math.floorMod(id, 3L).toInt))
      } else {
        assert(m.format == "jpeg")
        assert(m.channels == (if (math.floorMod(id, 4L) == 1L) 1 else 3))
      }
    }
    // both SOF0 and SOF2 variants and the segment-skip path must have
    // been exercised (ids mod 8 spread ensures both marker branches)
    assert(got.keys.exists(id => id % 2 == 1 && math.floorMod(id, 8L) < 4) &&
      got.keys.exists(id => id % 2 == 1 && math.floorMod(id, 8L) >= 4))
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
  }
}

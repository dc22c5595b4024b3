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
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StructType}
import graft.operators.{Decode, Multimodal}

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val media = Multimodal.media(spark, sf)

  test("media table: binary payload column + typed metadata struct") {
    val schema = media.schema
    assert(schema("content").dataType == BinaryType)
    assert(schema("meta").dataType.isInstanceOf[StructType])
    val r = media.filter(col("doc_id") === 3).select("media_type", "meta.duration_ms")
      .as[(String, Long)].collect()(0)
    assert(r == (("image", 1000L + 3 % 120 * 500)))
  }

  test("batched decode matches the documented stub formulas") {
    val got = Multimodal.decodeFeatures(Multimodal.asRecords(media), batchSize = 32)
    val expected = Tables.documents(spark, sf).select(
      col("doc_id"),
      expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END").as("media_type"),
      length(col("text")).as("byte_len"),
      graft.functions.GraftFunctions.poly_hash(col("text")).as("checksum"))
      .withColumn("width", (lit(64) + col("checksum") % 1024).cast("int"))
      .withColumn("height", (lit(64) + expr("checksum DIV 1024") % 1024).cast("int"))
      .withColumn("n_frames",
        when(col("media_type") === "image", 1)
          .when(col("media_type") === "audio", 0)
          .otherwise(least(expr("(1000 + (doc_id % 120) * 500) DIV 1000"), lit(8)).cast("int")))
    assert(got.count() == expected.count())
    assert(got.toDF().except(expected).isEmpty && expected.except(got.toDF()).isEmpty)
  }

  test("decode is map-only: no shuffle exchange in the plan") {
    val plan = Multimodal.decodeFeatures(Multimodal.asRecords(media))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("byteChecksum over UTF-8 bytes equals PolyHash over ASCII chars") {
    val s = "spark graft 42"
    assert(Decode.byteChecksum(s.getBytes("UTF-8")) == graft.functions.PolyHash.hash(s))
  }

  test("frame sampling: videos only, bounded count, even offsets") {
    val frames = Multimodal.sampleFrames(media)
      .as[(Long, Int, Long)].collect()
    assert(frames.nonEmpty)
    frames.groupBy(_._1).foreach { case (docId, rows) =>
      assert(docId % 3 == 2, "only video rows")
      assert(rows.length <= 8)
      assert(rows.map(_._2).sorted.toSeq == (0 until rows.length).toSeq)
      val duration = 1000 + (docId % 120) * 500
      rows.foreach { case (_, idx, off) =>
        assert(off == idx * (duration / rows.length))
      }
    }
  }

  test("frame sampling never touches the payload: binary column pruned from the plan") {
    val plan = Multimodal.sampleFrames(media).queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    // the payload construction (encode -> binary) must be pruned away
    assert(!plan.contains("encode(") && !plan.contains("binary"), plan)
  }

  test("resize: stride subsampling to the target, checksum over kept bytes") {
    val r = Multimodal.MediaRecord(7L, "image",
      "abcdefghij".getBytes("UTF-8"), 0L)
    // target 4 of len 10 -> stride 3, kept indices 0,3,6,9 -> "adgj"
    val got = graft.operators.Decode.resizeOne(r, 4)
    assert(got == Multimodal.ResizedMedia(7L, "image", 10, 3, 4,
      graft.operators.Decode.byteChecksum("adgj".getBytes("UTF-8"))))
    // payload shorter than the target passes through whole (stride 1)
    val small = graft.operators.Decode.resizeOne(r, 100)
    assert(small.stride == 1 && small.out_len == 10 &&
      small.out_checksum == graft.operators.Decode.byteChecksum(r.content))
    // empty payload: zero-length output, zero checksum
    val empty = graft.operators.Decode.resizeOne(
      Multimodal.MediaRecord(8L, "image", Array.empty[Byte], 0L), 4)
    assert(empty.out_len == 0 && empty.out_checksum == 0L)
  }

  test("resize dataset op is map-only and batch-invariant") {
    val recs = Multimodal.asRecords(media.filter(col("media_type") === "image"))
    val a = Multimodal.resize(recs, targetBytes = 8, batchSize = 3)
      .collect().sortBy(_.doc_id).toSeq
    val b = Multimodal.resize(recs, targetBytes = 8, batchSize = 1000)
      .collect().sortBy(_.doc_id).toSeq
    assert(a.nonEmpty && a == b)
    val plan = Multimodal.resize(recs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}

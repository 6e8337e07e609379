package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalOpsSpec extends SparkSpec {

  import MultimodalOps._

  private lazy val media = syntheticMedia(spark, 30).cache()

  test("synthetic media is deterministic and typed") {
    val a = syntheticMedia(spark, 10).collect().sortBy(_.media_id)
    val b = syntheticMedia(spark, 10).collect().sortBy(_.media_id)
    assert(a.map(_.bytes.toSeq) === b.map(_.bytes.toSeq))
    assert(a.map(_.kind).distinct.sorted === Seq("audio", "image", "video"))
  }

  test("extractFeatures yields 16-dim embeddings, deterministic across runs") {
    val f1 = extractFeatures(spark, media).collect().sortBy(_.media_id)
    val f2 = extractFeatures(spark, media).collect().sortBy(_.media_id)
    assert(f1.length === 30)
    assert(f1.forall(_.embedding.length === 16))
    assert(f1.map(_.embedding.toSeq) === f2.map(_.embedding.toSeq))
    // features are content-sensitive: not all identical
    assert(f1.map(_.embedding.toSeq).distinct.length > 1)
  }

  test("feature extraction survives repartitioning (per-partition decoder)") {
    val f1 = extractFeatures(spark, media).collect().sortBy(_.media_id).map(_.embedding.toSeq)
    val f8 = extractFeatures(spark, media.repartition(8)).collect().sortBy(_.media_id).map(_.embedding.toSeq)
    assert(f1.toSeq === f8.toSeq)
  }

  test("resize pads/crops to target and updates metadata") {
    val out = resize(spark, media, 128).collect()
    assert(out.forall(_.bytes.length === 128))
    assert(out.forall(_.width === 32))
  }

  test("sampleFrames explodes video rows into every-k frames") {
    val frames = sampleFrames(spark, media, everyK = 2)
    assert(frames.columns.toSeq === Seq("media_id", "frame_no", "frame_bytes"))
    val counts = frames.groupBy("media_id").count().collect()
    assert(counts.nonEmpty)
    // only video rows contribute
    val videoIds = media.filter(_.kind == "video").collect().map(_.media_id).toSet
    assert(counts.map(_.getAs[Long]("media_id")).forall(videoIds.contains))
    // frame numbers are the sampled ones
    val fns = frames.select("frame_no").distinct().collect().map(_.getInt(0)).sorted
    assert(fns.forall(_ % 2 == 0))
  }

  test("featureTable feeds the similarity path (cosine top-1 runs on it)") {
    val ft = featureTable(spark, media)
    assert(ft.columns.toSeq === Seq("vec_id", "embedding"))
    // brute-force cosine between first vector and the rest via the same
    // higher-order-function dot product the similarity operators use
    val q = ft.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv")).crossJoin(ft.filter(col("vec_id") =!= 0))
      .withColumn("dot", expr(
        "aggregate(zip_with(qv, embedding, (x, y) -> CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"))
    assert(q.count() === 29)
    assert(q.filter(col("dot").isNull).count() === 0)
  }
}

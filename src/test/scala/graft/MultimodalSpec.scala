package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val assets = Multimodal.assets(spark, TestSpark.sf)

  test("asset table: binary payload column with typed metadata") {
    val schema = assets.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(assets.count() == Tables(spark, TestSpark.sf, "documents").count())
    assert(assets.select("kind").distinct().count() == 3)
  }

  test("batched decode covers every asset exactly once, any batch size") {
    val f1 = Multimodal.extractFeatures(assets, Multimodal.FakeDecoder, batchSize = 7)
    val f2 = Multimodal.extractFeatures(assets, Multimodal.FakeDecoder, batchSize = 256)
    assert(f1.count() == assets.count())
    // batch size must not change results (pure per-asset decode)
    assert(f1.toDF().exceptAll(f2.toDF()).count() == 0)
  }

  test("decode is deterministic and only videos are multi-frame") {
    val f = Multimodal.extractFeatures(assets, Multimodal.FakeDecoder)
    assert(f.filter(col("kind") =!= "video" && col("n_frames") =!= 1).count() == 0)
    assert(f.filter(col("width") < 16 || col("height") < 16).count() == 0)
  }

  test("resize bounds both dims, preserving row count") {
    val f = Multimodal.extractFeatures(assets, Multimodal.FakeDecoder)
    val r = Multimodal.resize(f, maxDim = 32)
    assert(r.count() == f.count())
    assert(r.filter(col("width") > 32 || col("height") > 32).count() == 0)
  }

  test("frame sampling emits ceil(n_frames / k) rows per video") {
    val f = Multimodal.extractFeatures(assets, Multimodal.FakeDecoder)
    val sampled = Multimodal.sampleFrames(f, everyK = 5)
    val want = f.select(col("asset_id"),
      ceil(col("n_frames") / lit(5.0)).cast("long").as("w"))
    val got = sampled.groupBy("asset_id").count()
    assert(got.join(want, "asset_id")
      .filter(col("count") =!= col("w")).count() == 0)
  }
}

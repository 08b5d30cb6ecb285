package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The mapPartitions decode path must agree with the equivalent column
  * expressions (same sha, same byte counts) — i.e. the typed batch plumbing
  * introduces no drift vs the declarative plan. */
class MultimodalSpec extends SparkSpec {

  test("stub decode features match column-expression ground truth") {
    val feats = Multimodal.queries("multimodal_features")(spark, sf)
    val truth = Tables.documents(spark, sf).select(
      col("doc_id"),
      sha2(col("text"), 256).as("sha_expr"),
      length(col("text")).as("len_expr"))
    val joined = feats.join(truth, "doc_id")
    assert(joined.count() === Tables.documents(spark, sf).count())
    assert(joined.filter(col("content_sha") =!= col("sha_expr")).count() === 0)
    assert(joined.filter(col("n_bytes") =!= col("len_expr")).count() === 0)
    assert(joined.filter(col("fake_width") =!= col("n_bytes") % 640).count() === 0)
  }

  test("media_type partitions cover all three modalities") {
    val types = Multimodal.mediaTable(spark, sf)
      .select("media_type").distinct().collect().map(_.getString(0)).toSet
    assert(types === Set("image/png", "audio/wav", "video/mp4"))
  }
}

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

  test("content-defined chunking is shift-resistant (fixed framing is not)") {
    // insert a prefix into a payload: CDC boundaries re-align after at most
    // one chunk, so most chunk fingerprints survive; fixed-size framing
    // shifts every frame
    def chunkSet(text: String): Set[String] = {
      val bs = Multimodal.cdcBoundaries(text)
      val splits = (0 +: bs.toSeq :+ text.length).distinct.sorted
      splits.sliding(2).collect { case Seq(a, b) if b > a => text.substring(a, b) }.toSet
    }
    val base = (1 to 60).map(i => s"token$i word$i item$i").mkString(" ")
    val shifted = "inserted prefix material " + base
    val a = chunkSet(base)
    val b = chunkSet(shifted)
    val sharedCdc = a.intersect(b).size.toDouble / a.size
    assert(sharedCdc >= 0.5, s"CDC should retain most chunks, got $sharedCdc")
    // fixed 64-char frames: nothing survives an unaligned insert
    val fa = base.grouped(64).toSet
    val fb = shifted.grouped(64).toSet
    assert(fa.intersect(fb).size <= 1)
  }
}

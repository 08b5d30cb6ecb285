package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class PerceptronSpec extends SparkSpec {

  test("batch perceptron steps match a driver-side replay on a planted corpus") {
    val s0 = spark; import s0.implicits._
    val docs = Seq(
      (1L, "apple banana apple", "en", "s1"),
      (2L, "banana cherry", "en", "s1"),
      (3L, "cherry cherry date", "fr", "s2"),
      (4L, "date apple", "de", "s2"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("graft_perc_").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Perceptron.queries("perceptron_steps")(spark, dir).collect()

    // independent replay with plain Scala collections (same tokenizer
    // semantics as Text.tokens: lower -> split non-alnum -> drop empties)
    val P = 2147483647L; val D = 64
    def code(t: String) = t.foldLeft(0L)((a, c) => (a * 131 + c.toLong) % P)
    def feats(text: String): Map[Int, Long] =
      text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
        .groupBy(t => (code(t) % D).toInt).view.mapValues(_.length.toLong).toMap
    val data = Seq(
      (1L, feats("apple banana apple")),
      (1L, feats("banana cherry")),
      (-1L, feats("cherry cherry date")),
      (-1L, feats("date apple"))).map { case (y, x) => (y, x) }
    var w = Map.empty[Int, Long].withDefaultValue(0L)
    for (t <- 1 to 2) {
      val mis = data.filter { case (y, x) =>
        y * x.map { case (f, v) => w(f) * v }.sum <= 0 }
      val delta = mis.flatMap { case (y, x) => x.map { case (f, v) => f -> y * v } }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap.withDefaultValue(0L)
      val got = rows.filter(_.getAs[Int]("step") == t)
      assert(got.length === D)
      assert(got.map(_.getAs[Long]("n_mis")).toSet === Set(mis.length.toLong))
      got.foreach { r =>
        val f = r.getAs[Int]("feat")
        assert(r.getAs[Long]("w_before") === w(f), s"step $t feat $f before")
        assert(r.getAs[Long]("delta") === delta(f), s"step $t feat $f delta")
        assert(r.getAs[Long]("w_after") === w(f) + delta(f), s"step $t feat $f after")
      }
      w = (0 until D).map(f => f -> (w(f) + delta(f))).toMap.withDefaultValue(0L)
    }
  }

  test("real corpus: step 1 is total, steps chain, training moves the model") {
    val rows = Perceptron.queries("perceptron_steps")(spark, sf).collect()
    val nTokDocs = Tables.documents(spark, sf)
      .filter(size(Text.tokens(col("text"))) > 0).count()
    val s1 = rows.filter(_.getAs[Int]("step") == 1)
    val s2 = rows.filter(_.getAs[Int]("step") == 2)
    // w = 0 gives every tokenized doc margin 0 -> all misclassified
    assert(s1.head.getAs[Long]("n_mis") === nTokDocs)
    // chaining: step 2's before-weights are step 1's after-weights
    val after1 = s1.map(r => r.getAs[Int]("feat") -> r.getAs[Long]("w_after")).toMap
    s2.foreach(r =>
      assert(r.getAs[Long]("w_before") === after1(r.getAs[Int]("feat"))))
    // the update produced a real model: nonzero weights, and step 2 no
    // longer misclassifies the entire corpus
    assert(s1.exists(_.getAs[Long]("w_after") != 0L))
    assert(s2.head.getAs[Long]("n_mis") < nTokDocs)
  }
}

package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics checks for the vocabulary-layer operators (Lexicon.scala). */
class LexiconSpec extends SparkSpec {

  test("vocab_coverage: thresholds are the first rank whose cumsum qualifies") {
    val rows = Lexicon.vocabCoverage(spark, sf).collect()
      .map(r => r.getAs[Long]("pct") -> r).toMap
    assert(rows.keySet === Set(50L, 90L, 95L, 99L))
    // brute force: global frequency-ranked cumulative coverage
    val freqs = graft.Tables.documents(spark, sf)
      .withColumn("toks", Text.tokens(col("text")))
      .select(explode(Text.ngramsAll(col("toks"), 2)).as("g"))
      .groupBy("g").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (g, n) => (-n, g) }
    val total = freqs.map(_._2).sum
    val cums = freqs.scanLeft(0L)(_ + _._2).drop(1)
    rows.foreach { case (pct, r) =>
      val want = cums.indexWhere(_ * 100 >= pct * total) + 1
      assert(r.getAs[Long]("vocab_size") === want.toLong, s"pct=$pct")
      assert(r.getAs[Long]("covered") === cums(want - 1))
      assert(r.getAs[Long]("total_grams") === total)
    }
    // monotone: higher coverage needs at least as many types
    assert(rows(50L).getAs[Long]("vocab_size") <= rows(90L).getAs[Long]("vocab_size"))
    assert(rows(95L).getAs[Long]("vocab_size") <= rows(99L).getAs[Long]("vocab_size"))
  }

  test("keyword_tagging: every doc present, tags sorted and vocabulary-true") {
    val rows = Lexicon.keywordTagging(spark, sf).collect()
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(rows.length.toLong === nDocs)
    val tagged = rows.filter(_.getAs[Long]("n_tags") > 0)
    assert(tagged.nonEmpty, "dictionary terms must hit the corpus vocabulary")
    rows.foreach { r =>
      val tags = r.getAs[String]("tags")
      val parts = if (tags.isEmpty) Array.empty[String] else tags.split(",")
      assert(parts.length.toLong === r.getAs[Long]("n_tags"))
      assert(parts.sorted.sameElements(parts), s"tags must be sorted: $tags")
      assert(parts.distinct.length === parts.length)
    }
  }

  test("curriculum_schedule: stages bucket the rare fraction, pos contiguous") {
    val rows = Lexicon.curriculumSchedule(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ng, nr, pm, st) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_rare"),
        r.getAs[Long]("diff_pm"), r.getAs[Long]("stage"))
      assert(nr <= ng)
      assert(pm === nr * 1000000L / math.max(ng, 1L))
      assert(st === math.min(3L, nr * 4L / math.max(ng, 1L)))
    }
    // positions are 1..k within each (stage, shard)
    rows.groupBy(r => (r.getAs[Long]("stage"), r.getAs[Long]("shard")))
      .values.foreach { g =>
        assert(g.map(_.getAs[Long]("pos")).sorted.toSeq === (1L to g.length))
      }
    // schedule uses more than one stage (difficulty actually spreads)
    assert(rows.map(_.getAs[Long]("stage")).distinct.length >= 2)
  }
}

package graft

import graft.llm._
import graft.queries._

/** Pins on the driver contract itself (SparkEntry): the full-oracle
  * discipline and the merge of ~30 module query maps are load-bearing and
  * easy to break silently — `Map ++` resolves a cross-module name
  * collision by dropping one implementation without a compile error. */
class ContractSpec extends SparkSpec {

  test("every registered query has an oracle and every oracle a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle SQL: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
  }

  test("no cross-module query-name collision is silently dropped by the merge") {
    val moduleMaps: Seq[(String, Int)] = Seq(
      "iot" -> 10,
      "Relational" -> Relational.queries.size,
      "Temporal" -> Temporal.queries.size,
      "Analytics" -> Analytics.queries.size,
      "Windowed" -> Windowed.queries.size,
      "Diagnostics" -> Diagnostics.queries.size,
      "Graph" -> Graph.queries.size,
      "TextAnalysis" -> TextAnalysis.queries.size,
      "TextDedup" -> TextDedup.queries.size,
      "LangModel" -> LangModel.queries.size,
      "CorpusClean" -> CorpusClean.queries.size,
      "CorpusQuality" -> CorpusQuality.queries.size,
      "TrainPrep" -> TrainPrep.queries.size,
      "KMeans" -> KMeans.queries.size,
      "Similarity" -> (Similarity.queries.size + Similarity.lshQueries.size),
      "IvfAnn" -> IvfAnn.queries.size,
      "PqAnn" -> PqAnn.queries.size,
      "AnnRecall" -> AnnRecall.queries.size,
      "SemDeDup" -> SemDeDup.queries.size,
      "Multimodal" -> Multimodal.queries.size,
      "Retrieval" -> Retrieval.queries.size,
      "Enrich" -> Enrich.queries.size,
      "Stats" -> Stats.queries.size,
      "ScaleOps" -> ScaleOps.queries.size,
      "PhraseIndex" -> PhraseIndex.queries.size,
      "KnnLabel" -> KnnLabel.queries.size,
      "BatchPrep" -> BatchPrep.queries.size,
      "Lexicon" -> Lexicon.queries.size,
      "Perceptron" -> Perceptron.queries.size,
      "Pca" -> Pca.queries.size,
      "Stump" -> Stump.queries.size)
    val expected = moduleMaps.map(_._2).sum
    assert(SparkEntry.queries.size === expected,
      s"merged query map lost ${expected - SparkEntry.queries.size} entries to a name collision " +
        s"(module sizes: ${moduleMaps.map { case (n, c) => s"$n=$c" }.mkString(", ")})")
  }

  test("query names are driver-safe (lowercase snake case)") {
    val bad = SparkEntry.queries.keys.filterNot(_.matches("[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-snake-case query names: $bad")
  }

  test("driver-side collect() stays confined to the audited bounded sites") {
    // Every .collect() in main is bounded by construction (one long per
    // partition in Ranks' prefix sums, the ≤4096-vector IVF codebook
    // sample, a 1-row argmax in the BPE trainer, the non-query Profile
    // tool). A new collect site means a new driver-bound audit — this
    // test forces that conversation instead of letting an unbounded
    // driver materialization slip in as "just a collect".
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    val audited = Map(
      "operators/Ranks.scala" -> 1, // per-partition totals (longs)
      "llm/IvfAnn.scala" -> 1,      // bounded codebook sample
      "llm/LangModel.scala" -> 1,   // limit(1) argmax
      "Profile.scala" -> 1)         // dev profiling main, not a query
    val found = java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .flatMap { p =>
        val n = java.util.regex.Pattern.quote(".collect()").r
          .findAllIn(java.nio.file.Files.readString(p)).size
        if (n > 0) Some(p.toString.replaceFirst(".*graft/", "") -> n) else None
      }.toMap
    assert(found === audited,
      s"collect() inventory drifted — audit any new site for driver-side boundedness: $found")
  }
}

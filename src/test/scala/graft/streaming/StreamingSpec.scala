package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import graft.SparkSpec
import graft.ingest.Standardize

/** The streaming ingest must (a) produce exactly the batch-mode result,
  * (b) be exactly-once across restarts via the checkpoint (T3), and
  * (c) pick up only new files on subsequent runs (incremental, T1). */
class StreamingSpec extends SparkSpec {

  private def csv(n: Int, tag: String): String =
    "id,room_id/id,noted_date,temp,out/in\n" +
      (1 to n).map(i => s"x_${tag}dev$i,Room $i,08-12-2018 09:3${i % 10},${20 + i},In").mkString("\n")

  private def write(dir: Path, name: String, content: String): Unit =
    Files.write(dir.resolve(name), content.getBytes(StandardCharsets.UTF_8))

  test("AvailableNow run equals batch standardize; rerun is a no-op; new files increment") {
    val landing = Files.createTempDirectory("graft-landing")
    val out = Files.createTempDirectory("graft-stream-out").toString + "/raw"
    val ckpt = Files.createTempDirectory("graft-ckpt").toString

    write(landing, "f1.csv", csv(5, "a"))
    IngestStream.run(spark, landing.toString, out, ckpt).awaitTermination()
    val got1 = spark.read.parquet(out)
    assert(got1.count() === 5)
    // streamed result == batch result over the same files
    val batch = Standardize.standardize(Standardize.readCsv(spark, landing.toString))
    assert(got1.drop("_batch_id").exceptAll(batch).count() === 0)
    assert(batch.exceptAll(got1.drop("_batch_id")).count() === 0)

    // second AvailableNow run with no new files: checkpoint makes it a no-op
    IngestStream.run(spark, landing.toString, out, ckpt).awaitTermination()
    assert(spark.read.parquet(out).count() === 5)

    // drop a new file: only it is processed
    write(landing, "f2.csv", csv(3, "b"))
    IngestStream.run(spark, landing.toString, out, ckpt).awaitTermination()
    assert(spark.read.parquet(out).count() === 8)
  }
}

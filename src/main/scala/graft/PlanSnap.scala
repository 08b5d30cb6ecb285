package graft

/** Dev main: write each named query's `.explain("formatted")` output to
  * plans/<tag>/<query>_<suffix>.txt — the before/after plan artifacts the
  * optimization rounds commit alongside the code.
  * Usage: runMain graft.PlanSnap <sfDir> <outDir> <suffix> <query...>
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val Array(dir, outDir, suffix, rest @ _*) = args: @unchecked
    val spark = Sessions.local("graft-plansnap")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    rest.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
      println(s"PLANSNAP wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}

package graft

/** Plan-audit utility: prints the formatted physical plan for the named
  * queries (all of them by default) so scan pushdown, broadcast choices and
  * shuffle counts can be reviewed per query. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-explain")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"\n===== $name =====")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

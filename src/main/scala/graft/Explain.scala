package graft

/** Plan-audit main: prints `explain("formatted")` for the named catalog
  * queries (or all) — the tool used to check that every operator plans
  * the way it should at scale (pushdown, broadcast-vs-shuffle choice,
  * codegen spans, no cartesian products). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.local("graft-explain")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.catalog.map(_.name)
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

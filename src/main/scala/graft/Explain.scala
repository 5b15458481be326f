package graft

/** Plan-audit utility: dump the executed plan of the named queries (or
  * all with no args) against a sf dir — the `.explain` loop SCALE.md's
  * audits come from. Usage: `runMain graft.Explain [sfDir] [q...]`. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.build("graft-explain")
    names.foreach { name =>
      println(s"########## $name")
      println(SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}

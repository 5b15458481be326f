package graft

/** Plan-audit utility: dump the executed plan of the named queries (or
  * all with no args) against a sf dir — the `.explain` loop SCALE.md's
  * audits come from. With `-exec` as the first arg, each query is
  * MATERIALIZED first so the printed plan is the AQE-final one
  * (runtime skew splits, coalesced reads, reused stages). With `-fmt`,
  * prints `explain("formatted")` instead (numbered operators +
  * PushedFilters/ReadSchema details — the shape the r16 optimization
  * round's plans/r16 evidence files carry).
  * Usage: `runMain graft.Explain [-exec] [-fmt] [sfDir] [q...]` — flags
  * combine (`-exec -fmt` prints the AQE-final formatted plan); an
  * unknown leading dash errors instead of being read as the sfDir
  * (r16 advice item 4). */
object Explain {
  def main(args: Array[String]): Unit = {
    val (flags, rest) = args.span(_.startsWith("-"))
    val unknown = flags.filterNot(Set("-exec", "-fmt"))
    require(unknown.isEmpty,
      s"Explain: unknown flag(s) ${unknown.mkString(", ")} (known: -exec, -fmt)")
    val exec = flags.contains("-exec")
    val fmt = flags.contains("-fmt")
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.001")
    val inventory = SparkEntry.queries ++ SparkEntry.benchExtra
    val names =
      if (rest.length > 1) rest.drop(1).toSeq else inventory.keys.toSeq.sorted
    val spark = GraftSession.build("graft-explain")
    names.foreach { name =>
      println(s"########## $name")
      val df = inventory(name)(spark, sfDir)
      // toRdd executes THIS dataset's QueryExecution (a write/count
      // would build a fresh one), so the final adaptive plan lands on
      // the same object we print; foreach materializes without
      // collecting rows to the driver
      if (exec) df.queryExecution.toRdd.foreach(_ => ())
      if (fmt)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      else println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}

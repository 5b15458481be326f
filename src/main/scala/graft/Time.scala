package graft

/** Per-query timing utility for plan iteration (complements [[Explain]]):
  * warm-up pass then min-of-two timed noop writes — the same methodology
  * as [[Bench]], scoped to the named queries so a single entry can be
  * profiled without running the whole inventory.
  * Usage: `runMain graft.Time [sfDir] [q...]`. */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val inventory = SparkEntry.queries ++ SparkEntry.benchExtra
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.build("graft-time")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      inventory(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(run) // warm-up
    val times = names.map(n => n -> math.min(run(n), run(n)))
    times.foreach { case (n, t) => println(f"TIME $n%-24s $t%8.3f s") }
    println(f"TIME total ${times.map(_._2).sum}%8.3f s")
    spark.stop()
  }
}

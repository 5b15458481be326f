package graft

/**
 * Isolated q75/q75b timing harness (round 10): VERDICT r9 flagged
 * q75b_neardup_probe at 5.05 s inside the full 100-entry bench vs 1.46 s
 * in r7 — this main times the two entries alone in a fresh session so a
 * plan-level regression can be separated from bench-context effects
 * (storage eviction, session state). Prints per-pass seconds to stderr.
 */
object Q75Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-q75probe")
    val inventory = SparkEntry.queries ++ SparkEntry.benchExtra
    val names = args.toSeq match {
      case Nil => Seq("q75_simhash_neardup", "q75b_neardup_probe")
      case xs => xs
    }
    def time(name: String): Double = {
      val t0 = System.nanoTime()
      inventory(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (pass <- 1 to 3; n <- names)
      System.err.println(f"[q75probe] pass$pass $n ${time(n)}%.3f s")
    spark.stop()
  }
}

package graft

/** Scratch main: run the wired q41_ann_topk at both oracle SFs and print
  * the per-probe ok flags — pre-commit guard for the recall-floor contract. */
object Q41Check {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("graft-q41check")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = SparkEntry.queries("q41_ann_topk")(spark, sf).collect()
      val line = rows.map(r => s"${r.getLong(0)}:${r.getBoolean(1)}").mkString(" ")
      println(s"== $sf  $line")
    }
    spark.stop()
  }
}

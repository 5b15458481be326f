package graft.plans

import graft.SparkTestSession
import graft.functions.GraftExtensions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** The band-join optimizer rule: a keyless BETWEEN join plans as a
  * binned equi-join when the width conf is set (no nested loop in the
  * physical plan), produces exactly the nested-loop result, respects
  * strict bounds and inverted intervals, and stays inert when the conf
  * is unset. Runs through the real `injectOptimizerRule` path: a fresh
  * session (same context) built with GraftExtensions. */
class BandJoinRewriteSpec extends AnyFunSuite with SparkTestSession {

  /** Build a session WITH the extensions over the shared context —
    * getOrCreate only applies extensions when no default session
    * exists, so clear it and restore afterwards. */
  private def withExtSession[A](f: SparkSession => A): A = {
    val shared = spark // force the shared session/context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try f(SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate())
    finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("band join rewrites to an equi-join and matches the nested-loop result") {
    withExtSession { s =>
      import s.implicits._
      val points = (1 to 200).map(i => (i.toLong, i * 3.0)).toDF("pid", "v")
      // the 300→200 band is inverted (matches nothing); 550–560 is empty
      val bands = Seq((10L, 0.0, 50.0), (11L, 45.0, 100.0),
        (12L, 300.0, 200.0), (13L, 550.0, 560.0)).toDF("bid", "lo", "hi")

      def q = points.join(bands,
        points("v") >= bands("lo") && points("v") <= bands("hi"))

      s.conf.unset("spark.graft.bandJoin.binWidth")
      val naive = q.collect().map(_.toSeq).toSet
      assert(planOf(q).contains("BroadcastNestedLoopJoin"))

      s.conf.set("spark.graft.bandJoin.binWidth", "50.0")
      try {
        val p = planOf(q)
        assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("Cartesian"),
          s"nested loop survived:\n$p")
        assert(q.collect().map(_.toSeq).toSet == naive)
        assert(q.columns.toSeq == Seq("pid", "v", "bid", "lo", "hi"))
      } finally s.conf.unset("spark.graft.bandJoin.binWidth")
    }
  }

  test("mirrored orientation and strict bounds rewrite too") {
    withExtSession { s =>
      import s.implicits._
      val points = (1 to 100).map(i => (i.toLong, i * 1.0)).toDF("pid", "v")
      val bands = Seq((1L, 10.0, 20.0), (2L, 19.5, 30.0)).toDF("bid", "lo", "hi")
      s.conf.set("spark.graft.bandJoin.binWidth", "10.0")
      try {
        // interval side LEFT, point side RIGHT, strict + flipped operands
        def q = bands.join(points,
          bands("lo") < points("v") && points("v") < bands("hi"))
        assert(!planOf(q).contains("BroadcastNestedLoopJoin"))
        val got = q.collect().map(r => (r.getLong(0), r.getLong(3))).toSet
        val want = (for ((b, lo, hi) <- Seq((1L, 10.0, 20.0), (2L, 19.5, 30.0));
                         i <- 1 to 100 if i > lo && i < hi)
          yield (b, i.toLong)).toSet
        assert(got == want)
      } finally s.conf.unset("spark.graft.bandJoin.binWidth")
    }
  }
}

package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.GraftColumnBridge

/**
 * Spark-native installation of the engine's custom expressions, two
 * ways:
 *
 *  1. cluster-wide via config —
 *     `--conf spark.sql.extensions=graft.functions.GraftExtensions`
 *     (the [[SparkSessionExtensions]] injection path, applied at
 *     session build);
 *  2. on a live session — [[GraftExtensions.register]] (tests, REPLs).
 *
 * After either, `cosine_sim(a, b)` is a first-class SQL function backed
 * by the codegen'd [[CosineSimExpr]] — usable from `spark.sql(...)`
 * exactly like a built-in, with none of a UDF's serialization or
 * codegen-barrier costs.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.CosineSimDescriptor)
    ext.injectFunction(GraftExtensions.FingerprintDescriptor)
    ext.injectFunction(GraftExtensions.CharEntropyDescriptor)
    ext.injectFunction(GraftExtensions.JaroWinklerDescriptor)
    // keyless band joins → binned equi-joins, opt-in via
    // spark.graft.bandJoin.binWidth (see BandJoinRewrite)
    ext.injectOptimizerRule(_ => new graft.plans.BandJoinRewrite)
  }
}

object GraftExtensions {
  private def cosineBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      s"cosine_sim expects 2 arguments, got ${children.length}")
    CosineSimExpr(children.head, children(1))
  }

  private def fingerprintBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 1,
      s"fingerprint_native expects 1 argument, got ${children.length}")
    FingerprintExpr(children.head)
  }

  /** (identifier, info, builder) tuple for the injection API. */
  val CosineSimDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimExpr].getName, "cosine_sim"),
      cosineBuilder)

  /** `fingerprint_native` — the codegen'd [[FingerprintExpr]]; the name
    * leaves the long-registered `fingerprint` Scala-UDF alias
    * ([[graft.slowlog.SlowLogTable.registerFunctions]]) untouched. */
  val FingerprintDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("fingerprint_native"),
      new ExpressionInfo(classOf[FingerprintExpr].getName, "fingerprint_native"),
      fingerprintBuilder)

  private def charEntropyBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 1,
      s"char_entropy expects 1 argument, got ${children.length}")
    CharEntropyExpr(children.head)
  }

  private def jaroWinklerBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      s"jaro_winkler expects 2 arguments, got ${children.length}")
    JaroWinklerExpr(children.head, children(1))
  }

  /** `char_entropy(text)` — per-row Shannon entropy, [[CharEntropyExpr]]. */
  val CharEntropyDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("char_entropy"),
      new ExpressionInfo(classOf[CharEntropyExpr].getName, "char_entropy"),
      charEntropyBuilder)

  /** `jaro_winkler(a, b)` — DuckDB-parity similarity, [[JaroWinklerExpr]]. */
  val JaroWinklerDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerExpr].getName, "jaro_winkler"),
      jaroWinklerBuilder)

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit = {
    GraftColumnBridge.registerFunction(spark, "cosine_sim",
      CosineSimDescriptor._2, CosineSimDescriptor._3)
    GraftColumnBridge.registerFunction(spark, "fingerprint_native",
      FingerprintDescriptor._2, FingerprintDescriptor._3)
    GraftColumnBridge.registerFunction(spark, "char_entropy",
      CharEntropyDescriptor._2, CharEntropyDescriptor._3)
    GraftColumnBridge.registerFunction(spark, "jaro_winkler",
      JaroWinklerDescriptor._2, JaroWinklerDescriptor._3)
  }
}

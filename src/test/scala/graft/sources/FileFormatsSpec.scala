package graft.sources

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip fidelity of the JSONL/CSV interchange sinks+sources:
  * exact set equality against the in-memory frame, including
  * CSV-hostile strings (commas, quotes, unicode, embedded newlines)
  * that force the
  * writer's quoting/escaping paths. */
class FileFormatsSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private val hostile = Seq(
    (1L, "plain text", "en"),
    (2L, "comma, inside", "en"),
    (3L, "a \"quoted\" span", "de"),
    (4L, "mixed, \"both\", and trailing,", "de"),
    (5L, "unicode → flèche ünd 漢字", "zh"),
    (6L, "embedded\nnewline and\r\ncrlf", "en")).toDF("id", "text", "lang")

  test("JSONL round trip is exact on hostile strings") {
    val path = "spark-warehouse/graft_bench_fmt_jsonl_spec"
    FileFormats.writeJsonl(hostile, path)
    val back = FileFormats.readJsonl(spark, path, hostile.schema)
    assert(back.exceptAll(hostile).isEmpty && hostile.exceptAll(back).isEmpty)
  }

  test("CSV round trip quotes and escapes hostile strings exactly") {
    val path = "spark-warehouse/graft_bench_fmt_csv_spec"
    FileFormats.writeCsv(hostile, path)
    val back = FileFormats.readCsv(spark, path, hostile.schema)
    assert(back.exceptAll(hostile).isEmpty && hostile.exceptAll(back).isEmpty)
  }

  test("both formats round-trip the real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val jp = "spark-warehouse/graft_bench_fmt_jsonl_corpus"
    val cp = "spark-warehouse/graft_bench_fmt_csv_corpus"
    FileFormats.writeJsonl(docs, jp)
    FileFormats.writeCsv(docs, cp)
    val j = FileFormats.readJsonl(spark, jp, docs.schema)
    val c = FileFormats.readCsv(spark, cp, docs.schema)
    assert(j.exceptAll(docs).isEmpty && docs.exceptAll(j).isEmpty)
    assert(c.exceptAll(docs).isEmpty && docs.exceptAll(c).isEmpty)
  }
}

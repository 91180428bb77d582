package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusStats, EventAnalytics, Perplexity}

/** Pins the four `*_guarantee` attestation queries (r17 verdict ask #5):
  * each rows-only sketch query's declared guarantee, expressed as a
  * verdict frame whose flag columns must be all-ones. These are the SAME
  * predicates the driver's DuckDB oracle asserts per round (the oracle
  * emits constant-true flags over the exact heavy/grouping sets, so a
  * violated guarantee hash-mismatches); the spec runs them at sf0.001 so
  * `sbt test` catches a broken predicate before the driver does.
  */
class GuaranteeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  /** Every row's named flag columns must equal 1 (and the frame must be
    * non-empty — an empty verdict frame attests nothing).
    */
  private def allOnes(df: org.apache.spark.sql.DataFrame,
      flags: Seq[String]): Unit = {
    val rows = df.collect()
    assert(rows.nonEmpty, "guarantee frame is empty — attests nothing")
    rows.foreach { r =>
      flags.foreach { f =>
        assert(r.getAs[Long](f) == 1L,
          s"guarantee violated: $f=0 in row $r")
      }
    }
  }

  test("MG sketch guarantee: every true heavy hitter contained, bound ok") {
    allOnes(CorpusStats.heavyHitterSketchGuarantee(spark, sf),
      Seq("contained", "bound_ok"))
  }

  test("GK value percentiles: every approx value rank-accurate") {
    allOnes(EventAnalytics.valuePercentilesApproxGuarantee(spark, sf),
      Seq("p50_ok", "p90_ok", "p99_ok"))
  }

  test("GK perplexity thresholds (unigram): per-lang rank bounds hold") {
    allOnes(Perplexity.perplexityBucketsApproxGuarantee(spark, sf),
      Seq("head_ok", "middle_ok"))
  }

  test("GK perplexity thresholds (bigram): per-lang rank bounds hold") {
    allOnes(Perplexity.perplexityBigramApproxGuarantee(spark, sf),
      Seq("head_ok", "middle_ok"))
  }
}

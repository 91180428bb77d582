package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.PortableRound

/** Benchmark decontamination — the training-data hygiene pass that flags
  * corpus documents overlapping an evaluation/benchmark set (public
  * recipe: the 13-gram collision checks of GPT-3 appendix C / Dodge et
  * al. 2021 C4 analysis; word-n-gram form here, n configurable).
  *
  * The benchmark set is modeled as the documents with
  * `doc_id % benchModulus = 0` — a deterministic stand-in for the
  * external eval corpus (the operator takes any DataFrame of benchmark
  * n-grams; the registered query uses the modulus form so the DuckDB
  * oracle can reproduce it).
  *
  * Scale shape (the asymmetry IS the design): an eval suite is tiny
  * (~10⁶ n-grams ≈ tens of MB) while the corpus is 100 TB, so the
  * benchmark side is collected into a broadcast hash join build side and
  * the corpus probes it SCAN-SIDE — corpus n-grams are exploded map-side
  * and never shuffled (matches are joined against the broadcast table in
  * the same stage as the scan). The only data-sized exchanges carry
  * (doc_id, count) pairs after map-side partial aggregation, plus the
  * slim (doc_id, lang, n_ngrams) metadata join — the text column never
  * leaves the scan. Joining on the n-gram STRING (not a 64-bit digest)
  * costs nothing here — the strings live only in the broadcast table and
  * the scan stage — so the overlap counts are exact, with no hash
  * collision caveat to carry.
  */
object Decontam {

  /** Per-document contamination report against the modulus-defined
    * benchmark set: distinct n-grams, overlapping n-grams, overlap
    * fraction, and the contaminated flag (`frac >= minFrac`). Documents
    * shorter than n words carry zero n-grams and a 0.0 fraction —
    * explicitly, not NULL, so downstream `contaminated = 0` filters keep
    * them. Benchmark members themselves score frac = 1.0 by construction
    * (every n-gram self-overlaps) — the natural sanity signal.
    */
  def contamination(spark: SparkSession, dir: String, n: Int = 3,
      benchModulus: Int = 20, minFrac: Double = 0.1): DataFrame = {
    val sh = Dedup.shingled(spark, dir, n)
    // benchmark n-gram set: distinct over the modulus-selected docs.
    // distinct() here is a shuffle of BENCHMARK n-grams only (tiny side).
    val bench = sh.filter(pmod(col("doc_id"), lit(benchModulus)) === 0)
      .select(explode(col("shingles")).as("shingle"))
      .distinct()
    // corpus probe: explode scan-side, broadcast-join the benchmark set,
    // then count matches per doc (map-side combine; shuffle = matches)
    val overlap = sh
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
      .join(broadcast(bench), "shingle")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    val perDoc = sh.select(col("doc_id"), size(col("shingles")).as("n_ngrams"))
    Tables.documents(spark, dir).select("doc_id", "lang")
      .join(perDoc, Seq("doc_id"), "left")
      .join(overlap, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("n_ngrams"), lit(0L)).cast("int").as("n_ngrams"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("overlap_frac",
        when(col("n_ngrams") > 0,
          PortableRound.r(col("n_overlap").cast("double") / col("n_ngrams"), 4))
          .otherwise(lit(0.0)))
      .withColumn("contaminated", (col("overlap_frac") >= minFrac).cast("int"))
      .orderBy("doc_id")
  }

  val oracles: Map[String, String] = Map(
    "q_decontam" ->
      """WITH w AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
        |sh AS (
        |  SELECT doc_id, lang,
        |         list_distinct(list_transform(range(1, len(w) - 1),
        |           i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingles
        |  FROM w WHERE len(w) >= 3),
        |bench AS (
        |  SELECT DISTINCT unnest(shingles) AS shingle FROM sh
        |  WHERE ((doc_id % 20) + 20) % 20 = 0),
        |ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
        |ov AS (
        |  SELECT doc_id, count(*) AS n_overlap
        |  FROM ex JOIN bench USING (shingle) GROUP BY doc_id)
        |SELECT d.doc_id, d.lang,
        |       CAST(coalesce(len(sh.shingles), 0) AS INT) AS n_ngrams,
        |       CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
        |       CASE WHEN coalesce(len(sh.shingles), 0) > 0
        |            THEN floor(CAST(coalesce(ov.n_overlap, 0) AS DOUBLE)
        |                       / len(sh.shingles) * 10000 + 0.5) / 10000.0
        |            ELSE 0.0 END AS overlap_frac,
        |       CAST(CASE WHEN coalesce(len(sh.shingles), 0) > 0
        |                  AND floor(CAST(coalesce(ov.n_overlap, 0) AS DOUBLE)
        |                            / len(sh.shingles) * 10000 + 0.5) / 10000.0 >= 0.1
        |            THEN 1 ELSE 0 END AS INT) AS contaminated
        |FROM documents d
        |LEFT JOIN sh USING (doc_id)
        |LEFT JOIN ov USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin
  )
}

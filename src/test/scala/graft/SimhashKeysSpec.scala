package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-14 combination-key candidate scheme
  * ([[Dedup.simhashCandidateKeys]]) against brute force on a planted
  * fixture: every hamming ≤ 3 pair must be a CANDIDATE (the Manku
  * pigeonhole — all-pairs recall), and the verified set (candidate ∧
  * hamming ≤ 3) must equal the brute-force hamming ≤ 3 pair set exactly
  * — which is also the 16-bit-chunk scheme's verified set, so this is
  * the candidate-set-equality proof that lets the DuckDB twins keep the
  * cheaper 4×16 replay as the oracle.
  */
class SimhashKeysSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("combination keys: verified pair set equals brute-force hamming<=3") {
    val rnd = new scala.util.Random(7)
    val mask = (1L << 62) - 1
    val bases = Seq.fill(40)(rnd.nextLong() & mask)
    // planted flips STRADDLE blocks on purpose (fully random bit picks):
    // 1–3 flips must be caught, 4 flips must be verified away
    def flip(x: Long, k: Int): Long =
      rnd.shuffle((0 until 62).toList).take(k)
        .foldLeft(x)((v, b) => v ^ (1L << b))
    val fps = (bases ++ bases.flatMap(b =>
      Seq(flip(b, 1), flip(b, 2), flip(b, 3), flip(b, 4)))).distinct
    val truth = (for {
      i <- fps.indices; j <- (i + 1) until fps.size
      if java.lang.Long.bitCount(fps(i) ^ fps(j)) <= 3
    } yield (i.toLong, j.toLong)).toSet
    assert(truth.nonEmpty, "fixture must plant near pairs")

    val df = fps.zipWithIndex.map { case (f, i) => (i.toLong, f) }
      .toDF("doc_id", "sh")
    val keyed = df.select(col("doc_id"), col("sh"),
      explode(Dedup.simhashCandidateKeys(col("sh"), 3)).as("ck"))
      .localCheckpoint()
    val cand = keyed.as("a")
      .join(keyed.as("b"),
        col("a.ck") === col("b.ck") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("ham"))
      .dropDuplicates("da", "db")
      .as[(Long, Long, Long)].collect()

    // pigeonhole: every true near pair is a candidate
    assert(truth.subsetOf(cand.map(t => (t._1, t._2)).toSet),
      "a hamming<=3 pair escaped the combination keys")
    // verified set == brute force (no hamming>3 pair survives the filter)
    assert(cand.filter(_._3 <= 3).map(t => (t._1, t._2)).toSet == truth,
      "verified set diverged from brute force")
  }

  test("combination keys: C(7,4)=35 tables at maxHamming=3, exact-match table at 0") {
    val one = Seq((1L, 123456789L)).toDF("doc_id", "sh")
    assert(one.select(size(Dedup.simhashCandidateKeys(col("sh"), 3)))
      .as[Int].head() == 35)
    // maxHamming=0 degenerates to one full-width exact key
    assert(one.select(size(Dedup.simhashCandidateKeys(col("sh"), 0)))
      .as[Int].head() == 1)
  }
}

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

  test("chunk scheme (keyBlocks=1) and combination scheme verify the identical pair set") {
    // the r15 adaptive-threshold contract: the scheme is a pure COST
    // call, so the verified (candidate AND hamming<=3) pair sets must
    // coincide on a fixture whose flips straddle block boundaries —
    // both ways (neither scheme may verify a pair the other misses)
    val rnd = new scala.util.Random(15)
    val mask = (1L << 62) - 1
    val bases = Seq.fill(40)(rnd.nextLong() & mask)
    def flip(x: Long, k: Int): Long =
      rnd.shuffle((0 until 62).toList).take(k)
        .foldLeft(x)((v, b) => v ^ (1L << b))
    val fps = (bases ++ bases.flatMap(b =>
      Seq(flip(b, 1), flip(b, 2), flip(b, 3), flip(b, 4)))).distinct
    val df = fps.zipWithIndex.map { case (f, i) => (i.toLong, f) }
      .toDF("doc_id", "sh")
    def verified(keyBlocks: Int): Set[(Long, Long)] = {
      val keyed = df.select(col("doc_id"), col("sh"),
        explode(Dedup.simhashCandidateKeysOf(col("sh"), 3, keyBlocks)).as("ck"))
        .localCheckpoint()
      keyed.as("a")
        .join(keyed.as("b"),
          col("a.ck") === col("b.ck") && col("a.doc_id") < col("b.doc_id"))
        .filter(bit_count(col("a.sh").bitwiseXOR(col("b.sh"))) <= 3)
        .select(col("a.doc_id"), col("b.doc_id"))
        .dropDuplicates()
        .as[(Long, Long)].collect().toSet
    }
    val chunk = verified(1)
    val combo = verified(Dedup.CandidateKeyBlocks)
    assert(chunk.nonEmpty && chunk == combo,
      s"schemes diverged: chunk-only=${(chunk -- combo).take(3)} combo-only=${(combo -- chunk).take(3)}")
    // chunk fan is C(4,1)=4 tables
    val one = Seq((1L, 5L)).toDF("doc_id", "sh")
    assert(one.select(size(Dedup.simhashCandidateKeysOf(col("sh"), 3, 1)))
      .as[Int].head() == 4)
  }

  test("adaptive scheme picks chunks below the cutover and keeps cluster output identical") {
    // end-to-end on a planted doc fixture: the sf-scale corpora sit far
    // below the 2^16 cutover, so the adaptive path must run the cheap
    // scheme while producing byte-identical clusters to the registered
    // (pre-adaptive, combination-only) semantics — which the brute
    // pair set pins here
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),  // near
      (3L, "completely different vocabulary in every token here now"),
      (4L, "unrelated words again nothing shared with anyone else"))
      .toDF("doc_id", "text")
    val got = Dedup.simhashClustersFrom(docs, maxHamming = 3)
      .select("doc_id", "cluster_rep")
      .as[(Long, Long)].collect().toMap
    // brute-force star election over doc-level hamming<=3 pairs
    val sh = docs.select(col("doc_id"),
      graft.functions.TextHashes.simhash62(split(col("text"), " ")).as("sh"))
      .as[(Long, Long)].collect().toMap
    val want = sh.map { case (id, f) =>
      val reps = sh.filter { case (_, g) =>
        java.lang.Long.bitCount(f ^ g) <= 3
      }.keys
      id -> reps.min
    }
    assert(got == want, s"adaptive clusters diverged: $got vs $want")
  }
}

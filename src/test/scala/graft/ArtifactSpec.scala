package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BloomFunctions, TextHashes}
import graft.operators.{Artifacts, Decontam, Similarity}

/** Pins the persisted-artifact contracts: save → load round-trips are
  * bit-exact, loaded artifacts drive consumers identically to the
  * in-session frames that produced them, and a hash-family version
  * mismatch REFUSES to load (the silent-false-negative failure the
  * BloomFunctions scaladoc required persistence to guard against).
  */
class ArtifactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("bloom filter: save/load round-trips words and probe decisions exactly") {
    val numBits = 1L << 16
    val k = 5
    val digests = Seq(11L, 22L, 33L, 44L, 1234567890123L).toDF("gh")
    val bloom = Decontam.bloomFrom(digests, numBits, k)
    val dir = Files.createTempDirectory("bloomart").toString + "/f"
    Artifacts.saveBloom(bloom, dir, numBits, k)
    val (loaded, nb2, k2) = Artifacts.loadBloom(spark, dir)
    assert(nb2 == numBits && k2 == k)
    // words bit-exact
    val w1 = bloom.head().getSeq[Long](0)
    val w2 = loaded.head().getSeq[Long](0)
    assert(w1 == w2)
    // probe decisions identical for members and non-members
    val probes = Seq(11L, 22L, 99L, 777L, 1234567890123L).toDF("gh")
    def hits(b: org.apache.spark.sql.DataFrame): Seq[Long] =
      probes.crossJoin(broadcast(b))
        .filter(BloomFunctions.bloomContainsCol(col("bloom"), col("gh"), numBits, k))
        .select("gh").as[Long].collect().sorted.toSeq
    assert(hits(bloom) == hits(loaded))
    // no false negative possible: every inserted digest probes true
    assert(hits(loaded).toSet.intersect(Set(11L, 22L, 1234567890123L))
      == Set(11L, 22L, 1234567890123L))
  }

  test("bloom filter: a foreign hash-family version refuses to load") {
    val dir = Files.createTempDirectory("bloomver").toString + "/f"
    val bloom = Decontam.bloomFrom(Seq(1L, 2L).toDF("gh"), 1L << 10, 3)
    // persist with a TAMPERED version stamp (what an old build's file
    // looks like to this build)
    bloom.select(col("bloom"),
      lit(TextHashes.HashFamilyVersion - 1).as("hash_family_version"),
      lit(1L << 10).as("num_bits"), lit(3).as("k"))
      .write.mode("overwrite").parquet(dir)
    val e = intercept[IllegalStateException](Artifacts.loadBloom(spark, dir))
    assert(e.getMessage.contains("hash family"))
  }

  test("codebook: assignment against the loaded artifact is bit-identical") {
    val emb = graft.Tables.embeddings(spark, sf)
      .withColumn("qe", graft.functions.VectorFunctions.quantizeCol(col("embedding")))
      .select("vec_id", "qe")
    val (cents, assigned) = Similarity.ivfAssign(spark, sf, nCells = 8,
      lloydIters = 2, materializeAssigned = false)
    val dir = Files.createTempDirectory("cbart").toString + "/cb"
    Artifacts.saveCodebook(cents, dir)
    val loaded = Artifacts.loadCodebook(spark, dir)
    val fresh = assigned.select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val reassigned = Similarity.assignWithCodebook(emb, loaded)
      .select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(reassigned == fresh)
  }

  test("codebook: version mismatch refuses to load") {
    val dir = Files.createTempDirectory("cbver").toString + "/cb"
    Seq((0, Seq(1L, 2L))).toDF("cell", "qc")
      .withColumn("hash_family_version", lit(TextHashes.HashFamilyVersion + 1))
      .write.mode("overwrite").parquet(dir)
    val e = intercept[IllegalStateException](Artifacts.loadCodebook(spark, dir))
    assert(e.getMessage.contains("hash family"))
  }
}

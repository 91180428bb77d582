package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextHashes

/** Versioned persistence for the engine's reusable index artifacts —
  * the "train once, serve many jobs" shape a 100 TB pipeline actually
  * runs: the Bloom filter of a benchmark set is built by one nightly
  * job and probed by every curation run until the benchmark changes;
  * the IVF codebook is trained on one corpus snapshot and reused to
  * assign every incremental batch (retraining per batch would both
  * waste the Lloyd scans and silently MOVE cell boundaries, breaking
  * any persisted per-cell statistics).
  *
  * Every artifact carries the hash-family version
  * ([[TextHashes.HashFamilyVersion]]) plus its structural parameters as
  * columns, and `load` REFUSES (IllegalStateException) on any mismatch —
  * the failure mode this prevents is not hypothetical: the Bloom
  * position family moved in round 10 and the simhash/fingerprint family
  * moved twice in round 13, and a filter persisted across either
  * boundary would probe wrong positions with NO error signal, turning
  * the sketch's one-sided error into silent false negatives (missed
  * contamination). The scaladoc contract on
  * [[graft.functions.BloomFunctions]] required exactly this guard of
  * whoever added persistence.
  *
  * Format: plain parquet (the artifact stays readable by any engine,
  * matching the repo's cross-engine discipline) — one data row plus the
  * version/parameter columns repeated on it; codebooks are one row per
  * cell. No custom binary container: the Bloom word array is a few MB
  * at the broadcast-budget ceiling and parquet's encoding handles it.
  */
object Artifacts {

  /** Write a [[Decontam.bloomFrom]] filter (one `bloom: array<bigint>`
    * row) with its sizing and hash-family stamp.
    */
  def saveBloom(bloom: DataFrame, path: String, numBits: Long, k: Int): Unit = {
    // a lying stamp defeats the whole guard: verify the claimed sizing
    // against the filter's actual word count before persisting it as
    // "the source of truth" (one 1-row action on a 1-row frame)
    val words = bloom.select(size(col("bloom"))).head().getInt(0)
    val expect = ((numBits + 63) >> 6).toInt
    require(words == expect,
      s"saveBloom: filter has $words words but numBits=$numBits implies " +
        s"$expect — the stamp would mis-size every probe")
    bloom.select(col("bloom"),
      lit(TextHashes.HashFamilyVersion).as("hash_family_version"),
      lit(numBits).as("num_bits"), lit(k).as("k"))
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a persisted Bloom filter, verifying the hash-family stamp and
    * returning (filter frame in the [[Decontam.bloomFrom]] shape,
    * numBits, k). Callers pass the returned sizing to the probe — using
    * session defaults against a differently-sized persisted filter
    * would silently read wrong word indices, so the artifact is the
    * source of truth.
    */
  def loadBloom(spark: SparkSession, path: String): (DataFrame, Long, Int) = {
    val df = spark.read.parquet(path)
    val meta = df.select("hash_family_version", "num_bits", "k").head()
    val ver = meta.getInt(0)
    if (ver != TextHashes.HashFamilyVersion)
      throw new IllegalStateException(
        s"persisted Bloom filter at $path was built by hash family v$ver; " +
          s"this build probes v${TextHashes.HashFamilyVersion} positions — " +
          "rebuild the filter (probing would yield silent false negatives)")
    val numBits = meta.getLong(1)
    val words = df.select(size(col("bloom"))).head().getInt(0)
    val expect = ((numBits + 63) >> 6).toInt
    if (words != expect)
      throw new IllegalStateException(
        s"persisted Bloom filter at $path carries $words words but its " +
          s"num_bits=$numBits stamp implies $expect — corrupt artifact")
    (df.select("bloom"), numBits, meta.getInt(2))
  }

  /** Write an IVF codebook (`cell: int, qc: array<bigint>` — the
    * [[Similarity.ivfAssign]] output shape) with its stamp.
    */
  def saveCodebook(centroids: DataFrame, path: String): Unit =
    centroids.select(col("cell"), col("qc"),
      lit(TextHashes.HashFamilyVersion).as("hash_family_version"))
      .coalesce(1).write.mode("overwrite").parquet(path)

  /** Load a persisted codebook, verifying the stamp. The quantized
    * centroids are engine-exact integers, so an assignment against the
    * loaded codebook is bit-identical to one against the in-session
    * frame that produced it (spec-pinned).
    */
  def loadCodebook(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    val ver = df.select("hash_family_version").head().getInt(0)
    if (ver != TextHashes.HashFamilyVersion)
      throw new IllegalStateException(
        s"persisted codebook at $path was built by hash family v$ver; " +
          s"this build is v${TextHashes.HashFamilyVersion} — retrain " +
          "(cell boundaries would not match the quantizer's sub-keys)")
    df.select("cell", "qc")
  }
}

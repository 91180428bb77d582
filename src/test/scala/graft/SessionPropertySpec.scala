package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the sessionization window chain (SURVEY §5.3):
  * random event streams, invariants that must hold for any input.
  * (Raw ScalaCheck generators sampled with fixed seeds — the
  * scalatest-scalacheck bridge isn't in the offline dependency cache.)
  */
class SessionPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val eventsGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 120)
    rows <- Gen.listOfN(n, for {
      user <- Gen.choose(0L, 4L)
      // offsets up to ~3 days in seconds, so >30min gaps are common
      off <- Gen.choose(0L, 3L * 86400)
    } yield (user, off))
  } yield rows

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("session count == users + number of >30min gaps; counts conserve") {
    samples(eventsGen, 12).foreach { rows =>
      val df = rows.zipWithIndex
        .map { case ((u, off), i) =>
          (i.toLong, new Timestamp(1465876800000L + off * 1000), u, "click", 0.0, "{}")
        }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val dir = java.nio.file.Files.createTempDirectory("sess").toString
      df.write.mode("overwrite").parquet(s"$dir/events.parquet")

      val sessions = operators.EventAnalytics.sessions(spark, dir).collect()
      // conservation
      assert(sessions.map(_.getAs[Long]("n_events")).sum == rows.length)
      // expected session count from first principles
      val expected = rows.groupBy(_._1).values.map { userRows =>
        val sorted = userRows.map(_._2).sorted
        1 + sorted.zip(sorted.tail).count { case (a, b) => b - a > 1800 }
      }.sum
      assert(sessions.length == expected)
      // no negative durations
      assert(sessions.forall(_.getAs[Long]("duration_sec") >= 0))
    }
  }

  test("PPJoin n-gram Jaccard equals naive all-pairs on random corpora") {
    // The prefix + positional + hash-preverify chain claims losslessness;
    // one fixed oracle corpus can't probe its edge cases (prefix boundary
    // ties, size-filter boundaries, duplicate docs). Random corpora with
    // planted near-dups vs a naive in-memory computation do.
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val docGen: Gen[List[String]] = for {
      n <- Gen.choose(3, 18)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ws
    val corpusGen: Gen[List[List[String]]] = for {
      k <- Gen.choose(4, 10)
      bases <- Gen.listOfN(k, docGen)
      idx <- Gen.choose(0, 100)
      w <- Gen.oneOf(vocab)
    } yield bases ++ bases.take(k / 2).map(b => b.updated(idx % b.length, w))
    samples(corpusGen, 8).foreach { corpus =>
      val dir = java.nio.file.Files.createTempDirectory("ppj").toString
      corpus.zipWithIndex
        .map { case (ws, i) =>
          val t = ws.mkString(" "); (i.toLong, t, "en", "src1", t.length.toLong)
        }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = operators.Dedup.ngramJaccardPairs(spark, dir)
        .select("doc_a", "doc_b", "common").as[(Long, Long, Int)].collect().toSet
      val shingles = corpus.map(ws => ws.sliding(3).map(_.mkString(" ")).toSet)
      val naive = (for {
        i <- corpus.indices; j <- corpus.indices
        if i < j && corpus(i).length >= 3 && corpus(j).length >= 3
        common = (shingles(i) intersect shingles(j)).size
        if common.toDouble / (shingles(i).size + shingles(j).size - common) >= 0.5
      } yield (i.toLong, j.toLong, common)).toSet
      assert(got == naive, s"corpus ${corpus.map(_.mkString(" "))}")
    }
  }

  test("hash split is total and formula-exact over extreme doc ids") {
    // Guards the 31-bit fold: the raw Knuth multiply overflows Long past
    // doc_id ~3.47e9 (ANSI would throw mid-query)
    val ids = Seq(0L, 1L, 2147483647L, 2147483648L, 3474169448L, Long.MaxValue)
    val dir = java.nio.file.Files.createTempDirectory("hs").toString
    ids.map(id => (id, "w x y z", "en", "src1", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = operators.TextAnalytics.hashSplitDocs(spark, dir)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    ids.foreach { id =>
      val b = ((id % 2147483648L) * 2654435761L) % 100
      val expected = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(got(id) == expected, s"id $id")
    }
  }

  test("windowed feature counts conserve rows for any window length") {
    Seq("5 minutes", "20 minutes", "1 hour").foreach { len =>
      val total = operators.FeatureJobs.windowedFeatures(spark, TestSpark.sf, len)
        .agg(sum(col("clicks") + col("views"))).as[Long].head()
      val base = Tables.events(spark, TestSpark.sf)
        .filter(col("event_type").isin("click", "view")).count()
      assert(total == base)
    }
  }
}

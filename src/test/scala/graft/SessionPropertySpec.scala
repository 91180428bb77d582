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

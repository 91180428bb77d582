package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextHashes

class TextHashesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fingerprint64 golden values and codegen/eval agreement") {
    // base-31 polynomial over UTF-8 bytes: "abc" = 97*31^2 + 98*31 + 99
    val expected = 97L * 31 * 31 + 98L * 31 + 99L
    val viaDf = Seq("abc").toDF("s")
      .select(TextHashes.fingerprint64($"s")).as[Long].head()
    assert(viaDf == expected)
    // eval path (no codegen) must agree with the codegen'd path
    val rows = Seq("", "a", "hello world", "éü世界").toDF("s")
    val gen = rows.select(TextHashes.fingerprint64($"s")).as[Long].collect().toSeq
    val eval = rows.collect().map(r =>
      TextHashes.fingerprint(org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)))).toSeq
    assert(gen == eval)
  }

  test("simhash64: identical token multisets hash equal; near sets are close") {
    val df = Seq(
      ("a b c d e f g h i j", "a b c d e f g h i j"),
      ("a b c d e f g h i j", "a b c d e f g h i k")).toDF("s1", "s2")
      .select(
        TextHashes.simhash64(split($"s1", " ")).as("h1"),
        TextHashes.simhash64(split($"s2", " ")).as("h2"))
      .withColumn("ham", bit_count($"h1".bitwiseXOR($"h2")))
      .select("ham").as[Int].collect()
    assert(df(0) == 0)
    assert(df(1) < 32, "one-token change must move few bits")
  }

  test("SQL registration exposes the functions to spark.sql") {
    TextHashes.register(spark)
    val n = spark.sql(
      "SELECT fingerprint64('abc') AS f, simhash64(array('a','b')) AS s")
      .as[(Long, Long)].head()
    assert(n._1 == 97L * 31 * 31 + 98L * 31 + 99L)
  }
}

package graft

/** The SQL surface: custom expressions reachable from spark.sql. */
class GraftSqlSpec extends SparkSpec {

  test("fnv1a32 / dot64 / word_ngrams registered for SQL") {
    Graft.register(spark)
    assert(spark.sql("SELECT fnv1a32('abc')").first().getLong(0) === 440920331L)
    assert(spark.sql(
      "SELECT dot64(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .first().getDouble(0) === 11.0)
    assert(spark.sql(
      "SELECT word_ngrams(split('a b c d', ' '), 3)")
      .first().getSeq[String](0) === Seq("a b c", "b c d"))
  }

  test("winnow registered for SQL and matches the Column API") {
    Graft.register(spark)
    val viaSql = spark.sql("SELECT winnow('abcdefghijklmno', 8, 4)")
      .first().getSeq[Long](0)
    val viaCol = spark.range(1).select(
      graft.functions.WinnowFingerprints.winnow(
        org.apache.spark.sql.functions.lit("abcdefghijklmno"), 8, 4))
      .first().getSeq[Long](0)
    assert(viaSql.nonEmpty && viaSql === viaCol)
  }

  test("word_ngrams rejects a non-literal n") {
    Graft.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT word_ngrams(split('a b', ' '), cast(rand()*2 as int))")
        .collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}

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
    assert(spark.sql(
      "SELECT word_set_hits(split('the cat the dog', ' '), 'the,a')")
      .first().getLong(0) === 2L)
  }

  test("char_class_counts registered for SQL") {
    Graft.register(spark)
    assert(spark.sql("SELECT char_class_counts('ab1 ?')")
      .first().getSeq[Long](0) === Seq(2L, 1L, 1L))
  }

  test("common_prefix_len registered for SQL; known answers") {
    Graft.register(spark)
    assert(spark.sql("SELECT common_prefix_len('order:12', 'order:15')")
      .first().getLong(0) === 7L)
    assert(spark.sql("SELECT common_prefix_len('abc', 'abc')")
      .first().getLong(0) === 3L)
    assert(spark.sql("SELECT common_prefix_len('abc', 'xyz')")
      .first().getLong(0) === 0L)
    assert(spark.sql("SELECT common_prefix_len('ab', 'abcd')")
      .first().getLong(0) === 2L)
    assert(spark.sql("SELECT common_prefix_len('', 'abc')")
      .first().getLong(0) === 0L)
    assert(spark.sql("SELECT common_prefix_len(CAST(NULL AS STRING), 'abc')")
      .first().isNullAt(0))
    // BYTE-level semantics pinned: é (C3 A9) vs è (C3 A8) share their
    // first UTF-8 byte — front-coding stores byte suffixes, so 1 is the
    // correct answer (the char-level oracle applies to ASCII keys only,
    // the documented scope shared with fnv1a32)
    assert(spark.sql("SELECT common_prefix_len('é', 'è')")
      .first().getLong(0) === 1L)
  }

  test("bit_length64 registered for SQL, matches the Column API") {
    Graft.register(spark)
    assert(spark.sql("SELECT bit_length64(0L)").first().getInt(0) === 0)
    assert(spark.sql("SELECT bit_length64(255L)").first().getInt(0) === 8)
    assert(spark.sql("SELECT bit_length64(256L)").first().getInt(0) === 9)
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

  test("sketch aggregates registered for SQL, equal to the Column API") {
    Graft.register(spark)
    spark.range(0, 1000).selectExpr("CAST(id % 137 AS STRING) AS v")
      .createOrReplaceTempView("sketch_in")
    // KMV estimate is deterministic: SQL and Column forms agree exactly
    val kmvSql = spark.sql(
      "SELECT kmv_distinct(fnv1a32(v), 32) FROM sketch_in")
      .first().getDouble(0)
    val kmvCol = spark.table("sketch_in")
      .agg(graft.sketch.KmvDistinct.kmvDistinct(
        graft.hash.Fnv1a32.fnv1a32(
          org.apache.spark.sql.functions.col("v")), 32))
      .first().getDouble(0)
    assert(kmvSql === kmvCol && kmvSql > 0.0)
    // the sketch STATE surfaces too, and is the sorted bottom-k
    val mins = spark.sql(
      "SELECT kmv_mins(fnv1a32(v), 32) FROM sketch_in").first().getSeq[Long](0)
    assert(mins.length === 32 && mins === mins.sorted)
    assert(kmvSql === 31.0 * 4294967296.0 / mins.last.toDouble,
      "the estimate must derive from the surfaced state")
    val cms = spark.sql(
      "SELECT cms_counts(v, 3, 64) FROM sketch_in").first().getSeq[Long](0)
    assert(cms.length === 3 * 64 && cms.sum === 3L * 1000)
    val bloom = spark.sql(
      "SELECT bloom_bits(v, 1024, 3) FROM sketch_in").first().getSeq[Long](0)
    assert(bloom.length === 1024 / 64 &&
      bloom.map(java.lang.Long.bitCount).sum > 0)
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

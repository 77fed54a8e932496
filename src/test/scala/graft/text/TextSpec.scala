package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.hash.Fnv1a32

class TextSpec extends SparkSpec {

  lazy val docs = spark.read.parquet(s"$sf/documents.parquet").cache()

  test("whitespace token count equals the document's word count") {
    val first = docs.orderBy("doc_id").select("doc_id", "text").first()
    val expected = first.getString(1).split("\\s+").length.toLong
    val got = TextQueries.queries("text_token_counts")(spark, sf)
      .filter(col("doc_id") === first.getLong(0)).first().getLong(1)
    assert(got === expected)
  }

  test("fingerprint equals the fnv1a32 kernel on the raw text") {
    val first = docs.orderBy("doc_id").select("doc_id", "text").first()
    val got = TextQueries.queries("text_fingerprint")(spark, sf)
      .filter(col("doc_id") === first.getLong(0)).first().getLong(1)
    assert(got === Fnv1a32.hashString(first.getString(1)))
  }

  test("quality score is bounded and ratios are sane") {
    val rows = TextQueries.queries("text_quality_score")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0) // quality
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0) // stop ratio
      assert(r.getDouble(3) > 0.0) // avg token len
    }
  }

  test("language vote is total: every doc gets a prediction") {
    val dist = TextQueries.queries("text_language_dist")(spark, sf).collect()
    assert(dist.map(_.getLong(1)).sum === docs.count())
  }
}

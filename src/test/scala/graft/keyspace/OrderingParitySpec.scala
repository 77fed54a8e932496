package graft.keyspace

import java.nio.charset.StandardCharsets

import graft.SparkSpec

/** SURVEY.md §7.4(d): range-scan bounds rely on three systems agreeing on
  * string order — Go compares raw bytes (`internal/shard/shard.go:578-580`),
  * Spark's UTF8String compares UTF-8 bytes, DuckDB's default collation is
  * binary. Pin that parity with keys whose code-point order differs from
  * byte order is impossible in UTF-8 (code-point order == byte order), but
  * mixed-script keys still catch accidental locale-sensitive collation.
  */
class OrderingParitySpec extends SparkSpec {
  import spark.implicits._

  val keys = Seq("simple", "user@example.com", "path/to/resource",
    "key-with-spaces here", "数字", "Zebra", "zebra", "École",
    "very:long:key:with:many:colons:and:segments", "order:42", "order:100")

  test("Spark string ordering equals raw UTF-8 byte ordering (Go semantics)") {
    val sparkSorted = keys.toDF("k").orderBy("k").collect().map(_.getString(0))
    val byteSorted = keys.sortWith { (a, b) =>
      val (x, y) = (a.getBytes(StandardCharsets.UTF_8),
        b.getBytes(StandardCharsets.UTF_8))
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n && x(i) == y(i)) i += 1
      if (i < n) (x(i) & 0xff) < (y(i) & 0xff) else x.length < y.length
    }
    assert(sparkSorted.toSeq === byteSorted)
  }

  test("range predicate [start,end) agrees between Spark filter and byte compare") {
    val (start, end) = ("order:1", "order:42")
    val sparkIn = keys.toDF("k")
      .filter($"k" >= start && $"k" < end).collect().map(_.getString(0)).toSet
    val byteIn = keys.filter(k => k >= start && k < end).toSet // JVM String
    // JVM String compare is UTF-16 code-unit order; for these keys (no
    // surrogates) it matches UTF-8 byte order
    assert(sparkIn === byteIn)
  }
}

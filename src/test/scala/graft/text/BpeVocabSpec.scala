package graft.text

import java.io.File

import graft.SparkSpec

/** The persisted tokenizer's contract: the served per-doc statistics
  * equal a driver-side replay of the persisted merge chain, and the
  * artifact builds once. */
class BpeVocabSpec extends SparkSpec {

  test("served tokenization equals a driver-side merge replay") {
    val path = BpeVocab.indexPath(spark, sf)
    def del(f: File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(del)
      f.delete()
    }
    del(new File(path))
    val ms = BpeVocab.merges(spark, sf)
    assert(ms.size == TextQueries.BpeTrainIters)
    ms.foreach { case (p, q) =>
      assert(p.startsWith("<") && p.endsWith(">") && p.contains("><"))
      assert(q == p.replace("><", ""))
    }

    def tokensOf(w: String): Long = {
      var r = w.flatMap(c => s"<$c>")
      ms.foreach { case (p, q) => r = r.replace(p, q) }
      r.count(_ == '<').toLong
    }
    val got = BpeVocab.tokenizeServed(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(got.size == docs.length)
    docs.take(25).foreach { case (id, text) =>
      val words = text.split(" ", -1)
      val expected = (words.length.toLong,
        words.map(_.length.toLong).sum,
        words.map(tokensOf).sum)
      assert(got(id) == expected, s"doc $id")
    }
    // merges actually compress: tokens < symbols corpus-wide
    val (syms, toks) = got.values.foldLeft((0L, 0L)) {
      case ((a, b), (_, s2, t)) => (a + s2, b + t)
    }
    assert(toks < syms)
  }

  test("the tokenizer builds once and is reused") {
    val path = BpeVocab.buildIfMissing(spark, sf)
    val marker = new File(s"$path/merges/_SUCCESS")
    val t0 = marker.lastModified()
    BpeVocab.tokenizeServed(spark, sf).collect()
    assert(marker.lastModified() == t0)
  }
}

package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The one-pass byte loop must agree with the regex formulation it
  * replaced — on known answers, on adversarial strings, and on the
  * whole fixture corpus (interpreted eval AND codegen paths). */
class CharClassCountsSpec extends SparkSpec {

  private def viaExpr(s: String): Seq[Long] = {
    import spark.implicits._
    Seq(s).toDF("t")
      .select(CharClassCounts.charClassCounts(col("t"))).head()
      .getSeq[Long](0)
  }

  test("known answers, including the \\s set and multi-byte bytes") {
    assert(viaExpr("abc XYZ 09") === Seq(6L, 2L, 2L))
    assert(viaExpr("") === Seq(0L, 0L, 0L))
    assert(viaExpr("\t\n\f\r ") === Seq(0L, 0L, 6L))
    assert(viaExpr("a1 !?") === Seq(1L, 1L, 1L))
    // multi-byte code points: é (2 bytes), 中 (3) — no class matches,
    // exactly like the [A-Za-z]/[0-9]/\s regexes
    assert(viaExpr("é中a") === Seq(1L, 0L, 0L))
  }

  test("bit-equal to the regex derivation over the whole corpus") {
    val t = col("text")
    val both = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        CharClassCounts.charClassCounts(t).as("cc"),
        (length(t) - length(regexp_replace(t, "[A-Za-z]", "")))
          .cast("long").as("ra"),
        (length(t) - length(regexp_replace(t, "[0-9]", "")))
          .cast("long").as("rd"),
        (length(t) - length(regexp_replace(t, "\\s", "")))
          .cast("long").as("rs"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val cc = r.getSeq[Long](1)
      assert(cc === Seq(r.getLong(2), r.getLong(3), r.getLong(4)),
        s"doc ${r.getLong(0)}: byte loop diverges from the regexes")
    }
  }
}

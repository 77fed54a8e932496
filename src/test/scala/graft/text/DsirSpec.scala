package graft.text

import graft.SparkSpec
import graft.hash.Fnv1a32

/** DSIR weights against an exact driver-side replay, plus the semantic
  * sanity check the operator exists for: documents that overlap the
  * target (benchmark) distribution must score above the corpus mean. */
class DsirSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
    .select("doc_id", "text").collect()
    .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)

  private lazy val expected: Map[Long, (Long, Double)] = {
    val b = PipelineQueries.BenchDocs
    val buckets = PipelineQueries.DsirBuckets
    def feats(t: String): Seq[Long] =
      t.split(" ").toSeq.map(w => Fnv1a32.hashString(w) % buckets)
    val tgtToks = docs.filter(_._1 < b).flatMap(d => feats(d._2))
    val propToks = docs.filter(_._1 >= b).flatMap(d => feats(d._2))
    val tc = tgtToks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cc = propToks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (tgtTotal, propTotal) = (tgtToks.length.toLong, propToks.length.toLong)
    def ratio(f: Long): Double =
      ((tc.getOrElse(f, 0L) + 1L) * (propTotal + buckets)).toDouble /
        ((cc(f) + 1L) * (tgtTotal + buckets))
    docs.filter(_._1 >= b).map { case (id, t) =>
      val fs = feats(t)
      val rfp = fs.map(f =>
        math.floor(ratio(f) * PipelineQueries.DsirFp + 0.5).toLong).sum
      id -> (fs.length.toLong,
        rfp / (fs.length * PipelineQueries.DsirFp))
    }.toMap
  }

  private lazy val got: Map[Long, (Long, Double)] =
    graft.SparkEntry.queries("corpus_dsir_weights")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap

  test("scores equal the exact driver-side replay bit-for-bit") {
    assert(got == expected)
  }

  test("benchmark-overlapping docs score above the corpus mean") {
    val contaminated = graft.SparkEntry
      .queries("corpus_contamination")(spark, sf)
      .collect()
      .filter(_.getAs[Boolean]("contaminated"))
      .map(_.getLong(0)).toSet
    assume(contaminated.nonEmpty)
    val mean = got.values.map(_._2).sum / got.size
    val contMean = contaminated.toSeq.map(got(_)._2).sum / contaminated.size
    assert(contMean > mean,
      s"contaminated mean $contMean not above corpus mean $mean")
  }
}

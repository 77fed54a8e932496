package graft.text

import graft.SparkSpec

class PipelineSpec extends SparkSpec {

  test("cleaning cascade partitions the corpus exactly") {
    val verdicts = PipelineQueries.queries("corpus_clean_pipeline")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(verdicts.values.sum === total)
    assert(verdicts.contains("kept") && verdicts("kept") > 0)
    assert(verdicts.getOrElse("near_dup", 0L) > 0, "planted dups must drop")
  }

  test("hash sampling is deterministic and near the target rate") {
    val a = PipelineQueries.queries("corpus_hash_sample")(spark, sf).collect()
    val b = PipelineQueries.queries("corpus_hash_sample")(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    val (n, sampled) = (a.map(_.getLong(1)).sum, a.map(_.getLong(2)).sum)
    val rate = sampled.toDouble / n
    assert(rate > 0.04 && rate < 0.20, s"rate $rate far from 10%")
  }
}

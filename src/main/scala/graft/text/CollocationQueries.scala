package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Collocation mining over the document corpus: PMI-style association
  * between adjacent tokens, kept in its algebraic RATIO form (observed
  * over expected) so both engines compute it from exact integer counts
  * with one double division chain — no transcendentals (ORACLE.md).
  *
  * Scale shape: one token-explode pass feeds the unigram aggregate and
  * one bigram-explode pass feeds the pair aggregate (both map-side
  * combined, corpus-sized shuffles on the token key — the same shape as
  * text_tfidf_keywords); everything after is vocabulary-sized. The
  * min-count cut happens BEFORE the two unigram joins, so the joined
  * table is the (tiny) candidate set, and both unigram sides broadcast.
  */
object CollocationQueries {

  /** Pairs below this count are noise (a single shared sentence can
    * produce a sky-high ratio at count 1). */
  val MinPairCount = 5

  /** Collocations reported. */
  val TopK = 20

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // lift(x,y) = p(xy) / (p(x)·p(y)) with p(xy) = c12/N2 over adjacent
    // pairs and p(w) = c1/N1 over tokens — i.e. (c12·N1·N1)/(N2·c1x·c1y).
    // c12·N1 stays exact BIGINT (≈2^41 worst case at sf0.1); the second
    // ·N1 and the denominator run in DOUBLE in the identical order on
    // both engines. exp-ln-free, so bit-exact. Top-K by (lift, w1, w2).
    "text_pmi_bigrams" -> ((s, dir) => {
      val toks = docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .localCheckpoint() // one tokenize feeds unigrams AND bigrams
      val uni = toks.select(explode(col("toks")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c1"))
        .localCheckpoint() // vocabulary-sized; feeds joins AND N1
      val n1 = uni.agg(sum("c1").as("n1"))
      val pairs = toks.filter(size(col("toks")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(toks)-2), " +
            "i -> struct(element_at(toks, i+1) AS w1, " +
            "element_at(toks, i+2) AS w2))")).as("bg"))
        .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        .localCheckpoint() // pair-sized; feeds the cut AND N2
      val n2 = pairs.agg(sum("c12").as("n2"))
      pairs.filter(col("c12") >= MinPairCount)
        .join(broadcast(uni.select(col("w").as("w1"), col("c1").as("c1x"))),
          "w1")
        .join(broadcast(uni.select(col("w").as("w2"), col("c1").as("c1y"))),
          "w2")
        .crossJoin(broadcast(n1)).crossJoin(broadcast(n2))
        .withColumn("lift",
          (col("c12") * col("n1")).cast("double") * col("n1") /
            (col("n2").cast("double") * col("c1x") * col("c1y")))
        .select(col("w1"), col("w2"), col("c12"), col("c1x"), col("c1y"),
          col("lift"))
        .orderBy(col("lift").desc, col("w1"), col("w2"))
        .limit(TopK)
    }))

  val oracle: Map[String, String] = Map(
    "text_pmi_bigrams" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
         |),
         |uni AS (
         |  SELECT w, count(*) AS c1
         |  FROM (SELECT unnest(toks) AS w FROM toks) GROUP BY 1
         |),
         |n1 AS (SELECT CAST(sum(c1) AS BIGINT) AS n1 FROM uni),
         |pairs AS (
         |  SELECT bg.w1, bg.w2, count(*) AS c12
         |  FROM (
         |    SELECT unnest(list_transform(range(len(toks) - 1),
         |             i -> struct_pack(w1 := toks[i + 1],
         |                              w2 := toks[i + 2]))) AS bg
         |    FROM toks WHERE len(toks) >= 2
         |  ) GROUP BY 1, 2
         |),
         |n2 AS (SELECT CAST(sum(c12) AS BIGINT) AS n2 FROM pairs)
         |SELECT p.w1, p.w2, p.c12, ux.c1 AS c1x, uy.c1 AS c1y,
         |       CAST(p.c12 * n1.n1 AS DOUBLE) * n1.n1 /
         |         (CAST(n2.n2 AS DOUBLE) * ux.c1 * uy.c1) AS lift
         |FROM pairs p
         |JOIN uni ux ON ux.w = p.w1
         |JOIN uni uy ON uy.w = p.w2
         |CROSS JOIN n1 CROSS JOIN n2
         |WHERE p.c12 >= $MinPairCount
         |ORDER BY lift DESC, p.w1, p.w2 LIMIT $TopK""".stripMargin)
}

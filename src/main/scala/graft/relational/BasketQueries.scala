package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Market-basket association rules over order baskets: which brands
  * co-occur in the same order beyond chance, as support / confidence /
  * lift rules — the classic co-purchase analysis, at the brand
  * granularity where the fixture is dense (25 items, every pair
  * observed).
  *
  * Scale shape: the basket table reduces to DISTINCT (order, brand)
  * first (one shuffle); the pair join is a SELF-join on the basket key,
  * so its fan-out is Σ|basket|² with |basket| bounded by the brand
  * count per order (≤7 here) — per-basket-quadratic, never
  * corpus-quadratic, the same cost discipline as the dedup posting
  * lists. Item tables are vocabulary-sized and broadcast.
  *
  * All rule metrics are single divisions of exact BIGINT counts
  * (c12·N ≤ 2³⁸ at sf0.1), so both engines agree bitwise (ORACLE.md).
  */
object BasketQueries {

  /** Pairs below this basket count are noise. */
  val MinPairBaskets = 5

  /** Rules reported (both directions compete). */
  val TopK = 20

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // lift(a,b) = P(ab)/(P(a)P(b)) = c12·N/(c1a·c1b); confidence(a→b) =
    // c12/c1a. Both directions of every surviving pair compete for the
    // top-k by (lift, antecedent, consequent) — lift is symmetric, so
    // direction pairs tie and the name tie-break keeps the cut
    // deterministic.
    "basket_pair_rules" -> ((s, dir) => {
      val items = s.read.parquet(s"$dir/lineitem.parquet")
        .join(broadcast(s.read.parquet(s"$dir/part.parquet")),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("basket"), col("p_brand").as("item"))
        .distinct()
        .localCheckpoint() // feeds N, c1, and both sides of the pair join
      val n = items.agg(countDistinct("basket").as("n"))
      val c1 = items.groupBy("item").agg(count(lit(1)).as("c1"))
      val pairs = items.as("a")
        .join(items.as("b"),
          col("a.basket") === col("b.basket") &&
            col("a.item") < col("b.item"))
        .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
        .agg(count(lit(1)).as("c12"))
        .filter(col("c12") >= MinPairBaskets)
      val both = pairs
        .select(col("item_a").as("antecedent"),
          col("item_b").as("consequent"), col("c12"))
        .unionAll(pairs.select(col("item_b").as("antecedent"),
          col("item_a").as("consequent"), col("c12")))
      both
        .join(broadcast(c1.select(col("item").as("antecedent"),
          col("c1").as("c1a"))), "antecedent")
        .join(broadcast(c1.select(col("item").as("consequent"),
          col("c1").as("c1b"))), "consequent")
        .crossJoin(broadcast(n))
        .select(col("antecedent"), col("consequent"),
          col("c12").as("pair_baskets"),
          col("c1a").as("ante_baskets"), col("c1b").as("cons_baskets"),
          (col("c12").cast("double") / col("n")).as("support"),
          (col("c12").cast("double") / col("c1a")).as("confidence"),
          ((col("c12") * col("n")).cast("double") /
            (col("c1a") * col("c1b"))).as("lift"))
        .orderBy(col("lift").desc, col("antecedent"), col("consequent"))
        .limit(TopK)
    }))

  val oracle: Map[String, String] = Map(
    "basket_pair_rules" ->
      s"""WITH items AS (
         |  SELECT DISTINCT l_orderkey AS basket, p_brand AS item
         |  FROM lineitem JOIN part ON p_partkey = l_partkey
         |),
         |n AS (SELECT count(DISTINCT basket) AS n FROM items),
         |c1 AS (SELECT item, count(*) AS c1 FROM items GROUP BY 1),
         |pairs AS (
         |  SELECT a.item AS item_a, b.item AS item_b, count(*) AS c12
         |  FROM items a JOIN items b
         |    ON a.basket = b.basket AND a.item < b.item
         |  GROUP BY 1, 2 HAVING count(*) >= $MinPairBaskets
         |),
         |dirs AS (
         |  SELECT item_a AS antecedent, item_b AS consequent, c12 FROM pairs
         |  UNION ALL
         |  SELECT item_b, item_a, c12 FROM pairs
         |)
         |SELECT b.antecedent, b.consequent, b.c12 AS pair_baskets,
         |       ca.c1 AS ante_baskets, cb.c1 AS cons_baskets,
         |       CAST(b.c12 AS DOUBLE) / n.n AS support,
         |       CAST(b.c12 AS DOUBLE) / ca.c1 AS confidence,
         |       CAST(b.c12 * n.n AS DOUBLE) / (ca.c1 * cb.c1) AS lift
         |FROM dirs b
         |JOIN c1 ca ON ca.item = b.antecedent
         |JOIN c1 cb ON cb.item = b.consequent
         |CROSS JOIN n
         |ORDER BY lift DESC, b.antecedent, b.consequent
         |LIMIT $TopK""".stripMargin)
}

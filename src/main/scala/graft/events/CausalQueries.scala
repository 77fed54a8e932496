package graft.events

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Difference-in-differences uplift over the event stream — the causal
  * companion to `events_ab_conversion`: instead of comparing arms at
  * one point (which a pre-existing arm imbalance poisons), compare each
  * arm's pre→post CHANGE and difference the changes. The pre-period
  * gap is the arm-imbalance control; what survives is the treatment
  * effect under the parallel-trends assumption.
  *
  * Arms follow the suite's assignment convention (`pmod(user_id, 2)`);
  * the pre/post boundary is the day-range midpoint, derived from the
  * data as exact integers. Outcome: purchases per active user in the
  * (arm, period) cell. Every cell statistic is an exact-BIGINT count
  * pair; the means and the DiD combination are fixed-order double
  * expressions, identical on both engines (ORACLE.md).
  *
  * Scale shape: one corpus scan → 4-cell aggregate (map-side combined,
  * countDistinct expands to one extra exchange); the DiD itself is
  * 4-row arithmetic broadcast back onto the cells.
  */
object CausalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_did_uplift" -> ((s, dir) => {
      val ev = EventsQueries.events(s, dir)
        .withColumn("day", expr(s"ts div ${EventsQueries.DayUs}"))
      val sp = ev.agg(
        expr("(min(day) + max(day) + 1) div 2").as("split_day"))
      val cells = ev.crossJoin(broadcast(sp))
        .withColumn("arm", pmod(col("user_id"), lit(2L)))
        .withColumn("period",
          when(col("day") < col("split_day"), "pre").otherwise("post"))
        .groupBy("arm", "period")
        .agg(countDistinct("user_id").as("n_users"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("n_purchases"))
        .withColumn("mean_purchases",
          col("n_purchases").cast("double") / col("n_users"))
        .localCheckpoint() // 4 rows; feeds the DiD pick and the output
      def cell(arm: Int, period: String) =
        max(when(col("arm") === arm && col("period") === period,
          col("mean_purchases")))
      val did = cells.agg(
        ((cell(1, "post") - cell(1, "pre")) -
          (cell(0, "post") - cell(0, "pre"))).as("did_uplift"))
      cells.crossJoin(broadcast(did))
        .select(col("arm"), col("period"), col("n_users"),
          col("n_purchases"), col("mean_purchases"), col("did_uplift"))
        .orderBy("arm", "period")
    }))

  val oracle: Map[String, String] = Map(
    "events_did_uplift" -> (s"WITH ${EventsQueries.eventsSql},\n" +
      s"""evd AS (
         |  SELECT *, ts // ${EventsQueries.DayUs} AS day FROM ev
         |),
         |sp AS (
         |  SELECT (min(day) + max(day) + 1) // 2 AS split_day FROM evd
         |),
         |cells AS (
         |  SELECT user_id % 2 AS arm,
         |         CASE WHEN day < sp.split_day THEN 'pre' ELSE 'post' END
         |           AS period,
         |         count(DISTINCT user_id) AS n_users,
         |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
         |                       ELSE 0 END) AS BIGINT) AS n_purchases
         |  FROM evd, sp GROUP BY 1, 2
         |),
         |m AS (
         |  SELECT *, CAST(n_purchases AS DOUBLE) / n_users
         |           AS mean_purchases
         |  FROM cells
         |),
         |did AS (
         |  SELECT (max(CASE WHEN arm = 1 AND period = 'post'
         |                   THEN mean_purchases END)
         |          - max(CASE WHEN arm = 1 AND period = 'pre'
         |                     THEN mean_purchases END))
         |         - (max(CASE WHEN arm = 0 AND period = 'post'
         |                     THEN mean_purchases END)
         |            - max(CASE WHEN arm = 0 AND period = 'pre'
         |                       THEN mean_purchases END)) AS did_uplift
         |  FROM m
         |)
         |SELECT m.arm, m.period, m.n_users, m.n_purchases,
         |       m.mean_purchases, did.did_uplift
         |FROM m, did ORDER BY m.arm, m.period""".stripMargin))
}

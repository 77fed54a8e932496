package graft.events

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort analytics over the events table: the acquisition-growth curve
  * and the full (cohort × age) retention matrix — the two views every
  * product dashboard derives from raw events, and the natural extension
  * of `events_retention`'s day-over-day number to the complete grid.
  *
  * Scale shape: both queries reduce the corpus FIRST — `first_seen` is a
  * user-sized aggregate (one shuffle on user_id, map-side combined) and
  * `activity` is the distinct (day, user) set — and all later joins and
  * windows run on those reduced tables. The cumulative window in the
  * growth curve is partition-less by definition (a global running sum),
  * but it runs over #days rows, not events; the retention matrix joins
  * activity⋈first_seen co-keyed on user_id, so the fact-sized join
  * reuses the aggregation's own hash partitioning.
  */
object CohortQueries {

  private def withDay(s: SparkSession, dir: String): DataFrame =
    EventsQueries.events(s, dir)
      .withColumn("day", expr(s"ts div ${EventsQueries.DayUs}"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // acquisition curve: per day the active users, the NEW users (first
    // ever appearance), and the cumulative user count — all integers,
    // exact on both engines
    "events_new_users_curve" -> ((s, dir) => {
      val ev = withDay(s, dir)
      val firstSeen = ev.groupBy("user_id").agg(min("day").as("first_day"))
      val newPerDay = firstSeen.groupBy(col("first_day").as("day"))
        .agg(count(lit(1)).as("n_new"))
      val activePerDay = ev.groupBy("day")
        .agg(countDistinct("user_id").as("n_active"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
      activePerDay.join(newPerDay, Seq("day"), "left")
        .select(col("day"), col("n_active"),
          coalesce(col("n_new"), lit(0L)).as("n_new"))
        .withColumn("cum_users", sum("n_new").over(w))
        .orderBy("day")
    }),

    // the full retention matrix: cohort = a user's first day, age = days
    // since; each cell is the cohort's active users at that age and the
    // retained fraction. retention_pct is ONE double division of two
    // exact longs — bit-identical on both engines.
    "events_cohort_retention" -> ((s, dir) => {
      val ev = withDay(s, dir)
      val firstSeen = ev.groupBy("user_id").agg(min("day").as("first_day"))
      val activity = ev.select("day", "user_id").distinct()
      val cohortSize = firstSeen.groupBy(col("first_day").as("cohort"))
        .agg(count(lit(1)).as("cohort_size"))
      activity.join(firstSeen, "user_id")
        .groupBy(col("first_day").as("cohort"),
          (col("day") - col("first_day")).as("age"))
        .agg(countDistinct("user_id").as("n_active"))
        .join(cohortSize, "cohort")
        .withColumn("retention_pct",
          col("n_active").cast("double") / col("cohort_size").cast("double"))
        .select("cohort", "age", "n_active", "cohort_size", "retention_pct")
        .orderBy("cohort", "age")
    }))

  val oracle: Map[String, String] = Map(
    "events_new_users_curve" -> (s"WITH ${EventsQueries.eventsSql},\n" +
      s"""ed AS (SELECT ts // ${EventsQueries.DayUs} AS day, user_id FROM ev),
         |first_seen AS (
         |  SELECT user_id, min(day) AS first_day FROM ed GROUP BY user_id
         |),
         |new_per_day AS (
         |  SELECT first_day AS day, count(*) AS n_new
         |  FROM first_seen GROUP BY first_day
         |),
         |active_per_day AS (
         |  SELECT day, count(DISTINCT user_id) AS n_active
         |  FROM ed GROUP BY day
         |)
         |SELECT a.day, a.n_active,
         |       coalesce(n.n_new, 0)::BIGINT AS n_new,
         |       CAST(sum(coalesce(n.n_new, 0))
         |            OVER (ORDER BY a.day ROWS UNBOUNDED PRECEDING)
         |            AS BIGINT) AS cum_users
         |FROM active_per_day a LEFT JOIN new_per_day n ON a.day = n.day
         |ORDER BY a.day""".stripMargin),

    "events_cohort_retention" -> (s"WITH ${EventsQueries.eventsSql},\n" +
      s"""ed AS (SELECT ts // ${EventsQueries.DayUs} AS day, user_id FROM ev),
         |first_seen AS (
         |  SELECT user_id, min(day) AS first_day FROM ed GROUP BY user_id
         |),
         |cohort_size AS (
         |  SELECT first_day AS cohort, count(*) AS cohort_size
         |  FROM first_seen GROUP BY first_day
         |),
         |cells AS (
         |  SELECT f.first_day AS cohort, a.day - f.first_day AS age,
         |         count(DISTINCT a.user_id) AS n_active
         |  FROM (SELECT DISTINCT day, user_id FROM ed) a
         |  JOIN first_seen f ON a.user_id = f.user_id
         |  GROUP BY 1, 2
         |)
         |SELECT c.cohort, c.age, c.n_active, s.cohort_size,
         |       CAST(c.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
         |         AS retention_pct
         |FROM cells c JOIN cohort_size s ON c.cohort = s.cohort
         |ORDER BY c.cohort, c.age""".stripMargin))
}

package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mix budget allocation by weighted water-filling.
  *
  * The planning step between "per-source token counts" and "how many
  * tokens to actually draw from each source": given a total token budget
  * B, per-source priority weights w_i (the hand-assigned domain
  * preferences — code×4, reference×3, …), and an availability cap of
  * [[EpochCap]] epochs per source (repeating a source more than that
  * measurably hurts, so cap_i = EpochCap·s_i), allocate
  *
  *   alloc_i = min(cap_i, w_i·λ)   with λ s.t. Σ alloc_i = B.
  *
  * Closed form, no iteration: sort sources by saturation point
  * cap_i/w_i ascending; the saturated set is a prefix of that order, and
  * prefix sums locate it. All comparisons are cross-multiplied into
  * EXACT integer arithmetic — w_i ∈ {1,2,3,4} all divide 12, so
  * ratio_i = 12·cap_i/w_i is an exact integer sort key and the prefix-j
  * feasibility test `ratio_(j) · W_j ≤ 12·(B − S_j)` never touches a
  * float. Both engines therefore agree bit-for-bit, floors included.
  *
  * Scale shape: ONE corpus pass (the per-source token count); everything
  * after operates on the #sources-row dimension, where the unpartitioned
  * windows are dimension-sized by construction — the same blessed pattern
  * as the stratified-quota planner. Final floor division loses < 1 token
  * per unsaturated source, so B − Σ alloc < #sources (spec-asserted).
  */
object BudgetQueries {

  /** Availability cap: a source can be repeated at most this many epochs. */
  val EpochCap = 3L

  /** Budget as a multiple of the corpus's total token count. */
  val BudgetEpochs = 2L

  /** Priority weight domain — must all divide [[WLcm]]. */
  val WLcm = 12L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_budget_waterfill" -> ((s, dir) => {
      val perSrc = s.read.parquet(s"$dir/documents.parquet")
        .groupBy("source")
        .agg(sum(size(split(col("text"), " ")).cast("long")).as("s_tok"))
        .withColumn("w",
          pmod(col("source").substr(lit(4), lit(10)).cast("long"), lit(4L))
            + 1L)
        .withColumn("cap", lit(EpochCap) * col("s_tok"))
        .withColumn("ratio", expr(s"($WLcm * cap) div w"))
      val all = Window.partitionBy()
      val byRatio = Window.orderBy("ratio", "source")
      val cum = byRatio.rowsBetween(Window.unboundedPreceding, 0)
      val ranked = perSrc
        .withColumn("budget", lit(BudgetEpochs) * sum("s_tok").over(all))
        .withColumn("w_total", sum("w").over(all))
        .withColumn("rk", row_number().over(byRatio).cast("long"))
        .withColumn("cum_cap", sum("cap").over(cum))
        .withColumn("cum_w", sum("w").over(cum))
        // feasible ⇔ sources 1..rk can ALL sit at their caps with the
        // remaining budget still filling everyone else past this ratio
        .withColumn("feasible",
          col("ratio") * (col("w_total") - col("cum_w")) <=
            lit(WLcm) * (col("budget") - col("cum_cap")))
      val located = ranked
        .withColumn("j_star",
          coalesce(max(when(col("feasible"), col("rk"))).over(all), lit(0L)))
        .withColumn("sat_cap", coalesce(
          max(when(col("rk") === col("j_star"), col("cum_cap"))).over(all),
          lit(0L)))
        .withColumn("w_rem", col("w_total") - coalesce(
          max(when(col("rk") === col("j_star"), col("cum_w"))).over(all),
          lit(0L)))
      located
        .withColumn("saturated", col("rk") <= col("j_star"))
        .withColumn("alloc_tokens",
          when(col("saturated"), col("cap")).otherwise(least(col("cap"),
            expr("(w * (budget - sat_cap)) div w_rem"))))
        .select(col("source"), col("s_tok").as("n_tokens"),
          col("w").as("weight"), col("cap").as("cap_tokens"),
          col("alloc_tokens"), col("saturated"),
          (col("alloc_tokens").cast("double") / col("s_tok")).as("epochs"))
        .orderBy("source")
    })
  )

  val oracle: Map[String, String] = Map(
    "corpus_budget_waterfill" ->
      s"""WITH per_src AS (
         |  SELECT source,
         |         CAST(sum(length(string_split(text, ' '))) AS BIGINT)
         |           AS s_tok
         |  FROM documents GROUP BY source
         |),
         |dim AS (
         |  SELECT source, s_tok,
         |         CAST(substring(source, 4) AS BIGINT) % 4 + 1 AS w,
         |         $EpochCap * s_tok AS cap,
         |         ($WLcm * $EpochCap * s_tok) // (CAST(substring(source, 4)
         |            AS BIGINT) % 4 + 1) AS ratio
         |  FROM per_src
         |),
         |ranked AS (
         |  SELECT *,
         |         $BudgetEpochs * sum(s_tok) OVER () AS budget,
         |         sum(w) OVER () AS w_total,
         |         row_number() OVER (ORDER BY ratio, source) AS rk,
         |         sum(cap) OVER (ORDER BY ratio, source
         |           ROWS UNBOUNDED PRECEDING) AS cum_cap,
         |         sum(w) OVER (ORDER BY ratio, source
         |           ROWS UNBOUNDED PRECEDING) AS cum_w
         |  FROM dim
         |),
         |feas AS (
         |  SELECT *, ratio * (w_total - cum_w) <=
         |            $WLcm * (budget - cum_cap) AS feasible
         |  FROM ranked
         |),
         |located AS (
         |  SELECT *,
         |    coalesce(max(CASE WHEN feasible THEN rk END) OVER (), 0)
         |      AS j_star
         |  FROM feas
         |),
         |level AS (
         |  SELECT *,
         |    coalesce(max(CASE WHEN rk = j_star THEN cum_cap END) OVER (), 0)
         |      AS sat_cap,
         |    w_total - coalesce(
         |      max(CASE WHEN rk = j_star THEN cum_w END) OVER (), 0) AS w_rem
         |  FROM located
         |)
         |SELECT source, s_tok AS n_tokens, CAST(w AS BIGINT) AS weight,
         |       CAST(cap AS BIGINT) AS cap_tokens,
         |       CAST(CASE WHEN rk <= j_star THEN cap
         |            ELSE least(cap, (w * (budget - sat_cap)) // w_rem)
         |       END AS BIGINT) AS alloc_tokens,
         |       rk <= j_star AS saturated,
         |       CAST(CASE WHEN rk <= j_star THEN cap
         |            ELSE least(cap, (w * (budget - sat_cap)) // w_rem)
         |       END AS DOUBLE) / s_tok AS epochs
         |FROM level ORDER BY source""".stripMargin
  )
}

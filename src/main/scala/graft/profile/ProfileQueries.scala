package graft.profile

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Column-level data profiling — the ingest audit that runs before any
  * pipeline consumes a new drop: per column its row/null/distinct counts,
  * min/max, and mean stringified length. The profile is what catches a
  * broken upstream export (nulls where there were none, a distinct count
  * collapsing to 1, a length distribution shifting) before 100 TB of
  * downstream work is wasted on it.
  *
  * Shape: every profiled column is stringified and unpivoted with `stack`
  * (row-local, no join), then ONE hash aggregate over (col_name) computes
  * all stats — so the cost is one scan of the k profiled columns and a
  * shuffle of partial aggregates, never per-column jobs. The distinct
  * count is exact (Spark plans the mixed distinct/non-distinct aggregate
  * via a single Expand — still one pass); at 100 TB swap `countDistinct`
  * for `approx_count_distinct` (or the KMV sketch in [[graft.sketch]])
  * when the audit tolerates ±2%.
  *
  * Stats are computed over the STRINGIFIED values (min/max/length
  * included) — one uniform schema for any column mix, matching what the
  * profile is for: diffing a drop against the previous drop's profile.
  */
object ProfileQueries {

  /** documents columns profiled, in stack order. */
  val DocCols: Seq[String] = Seq("doc_id", "lang", "source", "text", "n_chars")

  /** Generic profile over stringified columns of `df`. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    // stack(n, name1, val1, name2, val2, ...) → (col_name, val) rows
    val pairs = cols.flatMap(c => Seq(lit(c), col(c).cast("string")))
    df.select(stack((lit(cols.size) +: pairs): _*).as(Seq("col_name", "val")))
      .groupBy("col_name")
      .agg(
        count("*").as("n_rows"),
        (count("*") - count(col("val"))).as("n_null"),
        countDistinct(col("val")).as("n_distinct"),
        min(col("val")).as("min_val"),
        max(col("val")).as("max_val"),
        (sum(length(col("val"))).cast("double") / count(col("val")))
          .as("avg_len"))
      .orderBy("col_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "profile_documents" -> ((s, dir) =>
      profile(s.read.parquet(s"$dir/documents.parquet"), DocCols)))

  val oracle: Map[String, String] = Map(
    "profile_documents" -> {
      val legs = DocCols.map(c =>
        s"SELECT '$c' AS col_name, CAST($c AS VARCHAR) AS val FROM documents")
        .mkString("\n  UNION ALL ")
      s"""WITH u AS (
         |  $legs
         |)
         |SELECT col_name, count(*) AS n_rows,
         |       count(*) - count(val) AS n_null,
         |       count(DISTINCT val) AS n_distinct,
         |       min(val) AS min_val, max(val) AS max_val,
         |       CAST(sum(length(val)) AS DOUBLE) / count(val) AS avg_len
         |FROM u GROUP BY col_name ORDER BY col_name""".stripMargin
    })
}

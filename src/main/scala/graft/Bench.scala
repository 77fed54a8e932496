package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable.ArrayBuffer

/** Benchmark harness, hardened to be contention-auditable.
  *
  * Round 2's driver run recorded 1147 s for a suite that replays at 93 s
  * under the same configuration — non-uniform host stalls inflated single
  * cold timings and nothing in the artifact could prove it. Three defenses:
  *
  *   - every query runs [[Repeats]] times and reports the MIN (the best
  *     observation is the one least polluted by external load; all repeat
  *     times are also emitted under "samples" so a reader can see spread);
  *   - a fixed sentinel query (region groupBy — constant work, ~10 ms)
  *     is interleaved every [[SentinelEvery]] queries and its time series
  *     is emitted under "sentinel": drift in a constant-cost probe
  *     timestamps host contention directly into the JSON;
  *   - a query that throws records `-1` (never a small elapsed time
  *     indistinguishable from success) and its exception under "errors".
  */
object Bench {

  /** Materialize every output column. `count()` lets Catalyst prune all
    * projections, so projection-heavy queries would time scan+count instead
    * of the actual work; the `noop` sink consumes every row in full. */
  private def run(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  val Repeats = 2
  val SentinelEvery = 10

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"'           => "\\\""
      case '\\'          => "\\\\"
      case c if c < ' '  => f"\\u${c.toInt}%04x"
      case c             => c.toString
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: initialize parquet reader, codegen, and shuffle
    // machinery, and read EVERY fixture table end-to-end (all columns via
    // the noop sink) so no timed query absorbs the first cold read of a
    // table's pages. events.parquet goes through EventsQueries.events —
    // the unit-normalizing reader every query uses.
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    for (t <- tables)
      try run(spark.read.parquet(s"$sfDir/$t.parquet"))
      catch { case _: Throwable => () }
    try {
      run(graft.events.EventsQueries.events(spark, sfDir))
      run(spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_name").count())
      run(SparkEntry.entry(spark))
    } catch { case _: Throwable => () }

    def sentinelOnce(): Double = {
      val t0 = System.nanoTime()
      try run(spark.read.parquet(s"$sfDir/region.parquet")
        .groupBy("r_name").count())
      catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }

    val sentinelTimes = ArrayBuffer[Double]()
    val errors = ArrayBuffer[(String, String)]()
    val samples = ArrayBuffer[(String, Seq[Double])]()
    sentinelTimes += sentinelOnce()
    val results = SparkEntry.queries.toSeq.zipWithIndex.map {
      case ((name, fn), i) =>
        val times = (0 until Repeats).map { _ =>
          val t0 = System.nanoTime()
          val failed =
            try { run(fn(spark, sfDir)); false }
            catch {
              case e: Throwable =>
                if (!errors.exists(_._1 == name))
                  errors += name -> s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"
                true
            }
          val t = (System.nanoTime() - t0) / 1e9
          // queries that localCheckpoint intermediates (dedup family) leave
          // blocks behind; dropping them between runs keeps each timing
          // independent instead of degrading late queries under accumulated
          // storage-memory pressure. blocking=true so the removal itself
          // finishes outside the next query's timed region.
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
          if (failed) -1.0 else t
        }
        samples += name -> times
        if ((i + 1) % SentinelEvery == 0) sentinelTimes += sentinelOnce()
        // min over successful repeats; -1 marks an always-failing query
        val ok = times.filter(_ >= 0)
        name -> (if (ok.nonEmpty) ok.min else -1.0)
    }
    sentinelTimes += sentinelOnce()

    // The driver captures only the LAST 2000 characters of stdout; rounds 2
    // and 3 emitted a single ~6 KB line (full per-query samples inline) and
    // the driver recorded `"parsed": null` both times — the artifact was a
    // truncated fragment. Two outputs now:
    //   - bench_detail.json (cwd): the complete record — every query's min
    //     and raw repeat samples, the full sentinel series, full errors;
    //   - stdout: ONE compact JSON line, packed to stay under the capture
    //     budget — headline total, sentinel median/max (the contention
    //     signal), and the slowest queries greedily added until the line
    //     would exceed ~1800 chars, with the rest summarized under "others".
    // Locale.ROOT: the f interpolator is locale-sensitive — a comma-
    // decimal default locale would emit "0,339" and corrupt both JSON
    // outputs (exactly the parsed:null failure this format exists to fix)
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val total = results.collect { case (_, t) if t >= 0 => t }.sum
    val sortedSent = sentinelTimes.sorted
    val sentMed = sortedSent(sortedSent.size / 2)
    val sentMax = sortedSent.last

    val detail = {
      val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
        .mkString("{", ",", "}")
      val sampleJson = samples.map { case (k, ts) =>
        "\"" + k + "\":" + ts.map(r3).mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      val sentinelJson = sentinelTimes.map(r3).mkString("[", ",", "]")
      val errJson = errors.map { case (k, msg) =>
        "\"" + k + "\":\"" + jsonEscape(msg) + "\""
      }.mkString("{", ",", "}")
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"repeats":$Repeats,"samples":$sampleJson,"sentinel":$sentinelJson,"errors":$errJson,"sf":"$sfDir"}"""
    }
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_detail.json"),
      detail.getBytes("UTF-8"))

    val budget = 1800
    val byTime = results.sortBy { case (_, t) => -t }
    val shown = ArrayBuffer[(String, Double)]()
    var used = 0
    for ((k, v) <- byTime) {
      val entry = "\"" + k + "\":" + r3(v) + ","
      if (used + entry.length < budget - 300) { // reserve room for the frame
        shown += k -> v; used += entry.length
      }
    }
    val shownSet = shown.map(_._1).toSet
    val rest = results.filter { case (k, _) => !shownSet.contains(k) }
    val restSum = rest.collect { case (_, t) if t >= 0 => t }.sum
    val qs = shown.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${results.size},"repeats":$Repeats,"errors":${errors.size},"sentinel_med":${r3(sentMed)},"sentinel_max":${r3(sentMax)},"queries":$qs,"others":{"n":${rest.size},"sum":${r3(restSum)}},"detail":"bench_detail.json","sf":"$sfDir"}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Parallelism repair for the two stage shapes AQE mis-sizes (guide §2.5):
  *
  *   1. **Unsplittable input** — a parquet file with one row group scans
  *      as ONE task, so a compute-heavy derivation fused into the scan
  *      stage (shingling, tokenizing, codec decode) runs serially while
  *      the rest of the machine idles. The guide's prescription is
  *      "repartition immediately after the read". [[spread]] does that,
  *      gated on the actual scan partition count so it is a no-op on any
  *      corpus big enough to split naturally — at 100 TB the gate never
  *      fires and no shuffle is added.
  *
  *   2. **Explosion after aggregation** — AQE sizes a post-shuffle stage
  *      by the bytes ENTERING the exchange, but a posting-list /
  *      band-bucket stage emits O(k²) pairs per list AFTER it: bytes-in
  *      under-states compute-out by the explosion factor, and the whole
  *      pair generation lands on 1-2 tasks. [[pin]] makes the exchange
  *      an explicit-count hash repartition, which AQE leaves alone, so
  *      the exploding stage keeps the session's configured parallelism.
  *      Used only ahead of `collect_list`-style gather aggregates, where
  *      the skipped partial-aggregation phase reduced nothing anyway.
  *
  * Both derive the target count from session config (the cluster-tuned
  * `spark.sql.shuffle.partitions` / `defaultParallelism`), never a
  * constant, so local[N] and a 1000-core cluster each get their own
  * right answer.
  */
object Par {

  /** The session's configured shuffle parallelism. */
  def parts(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** Pin the exchange feeding an explosion-bearing aggregate: an
    * explicit-count hash repartition on the aggregate's keys that AQE
    * will not coalesce, so pair generation after the aggregate runs at
    * the configured parallelism instead of at 1-2 AQE-coalesced tasks.
    * The aggregate itself recognizes the child partitioning and adds no
    * second exchange. */
  def pin(df: DataFrame, keys: Column*): DataFrame =
    df.repartition(parts(df), keys: _*)

  /** Run independent eager legs (localCheckpoint / index-serve
    * materializations) of ONE query as concurrent Spark jobs
    * (guide §2.6): actions are only sequential because the driver calls
    * them sequentially, and a composition query whose legs share no
    * lineage wastes the cluster's tail capacity running them one after
    * another. Spark's scheduler is explicitly multi-job-safe; FIFO
    * back-fills the earlier leg's straggler tail with the next leg's
    * tasks. Results are position-stable and the computation per leg is
    * unchanged — only the wall-clock overlap differs. Any leg failure
    * rethrows after all legs settle. */
  def together[A](thunks: (() => A)*): Seq[A] = {
    val threads = thunks.map { t =>
      val box = new java.util.concurrent.atomic.AtomicReference[Either[Throwable, A]]()
      val th = new Thread(() =>
        box.set(try Right(t()) catch { case e: Throwable => Left(e) }))
      th.setDaemon(true)
      th.start()
      (th, box)
    }
    threads.map { case (th, box) =>
      th.join()
      box.get() match {
        case Right(a) => a
        case Left(e)  => throw e
      }
    }
  }

  /** Repartition an unsplittably-read frame before compute-heavy
    * per-row derivation, keyed (deterministic under retry — guide §2.5)
    * and gated: if the scan already carries at least the session's
    * parallelism (any real corpus), this is the identity and costs no
    * shuffle. `df` must be a raw scan (no shuffle in its plan) so that
    * `rdd.getNumPartitions` is a pure planning question. */
  def spread(df: DataFrame, key: Column): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p, key) else df
  }
}

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

  /** Opt-in switch for [[pin]]. Default OFF: round 11 measured the pin
    * sites as a net wall-clock REGRESSION at sf0.1 on a quiet host
    * (dedup_simhash_pairs 0.56×, dedup_minhash_lsh 0.64×,
    * dedup_simhash64_pairs 0.73×, plus their corpus_* consumers
    * 0.68–0.83×): with AQE's coalesced 1–2 task layout the serial pair
    * work costs less than 32-way task dispatch across the chain's many
    * small stages. The explosion-blindness diagnosis (AQE sizes the
    * post-shuffle stage by bytes entering the exchange, blind to the
    * O(k²) pair fan-out after it) remains correct — but at real corpus
    * scale the exchange input is large enough that AQE keeps the stage
    * wide on its own, so the pin only matters in a mid-scale band. A
    * cluster operator in that band can turn it on; the default keeps
    * the measured-faster layout. */
  val PinKey = "spark.graft.pinExplosions"

  /** Pin the exchange feeding an explosion-bearing aggregate: an
    * explicit-count hash repartition on the aggregate's keys that AQE
    * will not coalesce, so pair generation after the aggregate runs at
    * the configured parallelism instead of at 1-2 AQE-coalesced tasks.
    * The aggregate itself recognizes the child partitioning and adds no
    * second exchange. No-op unless [[PinKey]] is set true — see its
    * scaladoc for the measured evidence. */
  def pin(df: DataFrame, keys: Column*): DataFrame =
    if (df.sparkSession.conf.get(PinKey, "false").toBoolean)
      df.repartition(parts(df), keys: _*)
    else df

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
    // join ALL legs before inspecting any result: throwing at the first
    // failed leg would unwind the caller while later daemon threads are
    // still running Spark jobs (localCheckpoint actions), racing the
    // driver's Materialize.reapAll/unpersist and contaminating the next
    // query's timing — the documented "rethrows after all legs settle"
    // contract, now actually implemented that way.
    threads.foreach(_._1.join())
    threads.foreach { case (_, box) =>
      box.get() match {
        case Left(e) => throw e
        case _       => ()
      }
    }
    threads.map(_._2.get().toOption.get)
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

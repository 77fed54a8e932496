package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.multimodal.Multimodal

class PhashIndexStreamSpec extends SparkSpec {

  test("streaming probe emits exactly the brute-force near-dup hits " +
      "against the standing index, with per-band multiplicity") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val hashes = Multimodal.queries("media_image_phash")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    // arrival-ordered corpus: the oldest 60% of images are the standing
    // index, the newest 40% arrive as probes (this split also lands the
    // sf0.001 fixture's one near-dup pair — docs 120 and 360 — across
    // the two roles, keeping the test non-vacuous)
    val cut = hashes.map(_._1).sorted.apply((hashes.length * 6) / 10)
    val (regs, probes) = hashes.partition(_._1 < cut)
    val rows = regs.flatMap { case (id, hi, lo) =>
      PhashIndexStream.bandsOf(id, hi, lo, isProbe = false)
    } ++ probes.flatMap { case (id, hi, lo) =>
      PhashIndexStream.bandsOf(id, hi, lo, isProbe = true)
    }

    val input = MemoryStream[PhashKey]
    val q = PhashIndexStream.hits(input.toDS())
      .writeStream.format("memory").queryName("phash_hits")
      .outputMode("append").start()
    val (regRows, probeRows) = rows.partition(!_.isProbe)
    for (chunk <- regRows.grouped(math.max(1, regRows.length / 3))) {
      input.addData(chunk.toSeq); q.processAllAvailable()
    }
    input.addData(probeRows.toSeq)
    q.processAllAvailable()
    q.stop()

    val emitted = spark.table("phash_hits")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val got = emitted.toSet
    val expected = (for {
      (p, phi, plo) <- probes
      (i, ihi, ilo) <- regs
      d = java.lang.Long.bitCount(phi ^ ihi) +
        java.lang.Long.bitCount(plo ^ ilo)
      if d <= PhashIndexStream.HammingMax
    } yield (p, i, d.toLong)).toSet
    assert(got === expected,
      s"missing=${expected -- got} extra=${got -- expected}")
    assert(got.nonEmpty, "no probe hit at this SF — vacuous split")
    // multiplicity: a hit is emitted once per shared 16-bit band
    val counts = emitted.groupBy(identity).view.mapValues(_.length).toMap
    got.foreach { case hit @ (p, i, _) =>
      val (_, phi, plo) = probes.find(_._1 == p).get
      val (_, ihi, ilo) = regs.find(_._1 == i).get
      val shared =
        PhashIndexStream.bandsOf(p, phi, plo, isProbe = true)
          .zip(PhashIndexStream.bandsOf(i, ihi, ilo, isProbe = false))
          .count { case (a, b) => a.bv == b.bv }
      assert(counts(hit) === shared,
        s"$hit emitted ${counts(hit)}x, shares $shared bands")
    }
  }

  test("replayed registrations do not double future probe hits") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val reg = PhashIndexStream.bandsOf(1L, 5L, 9L, isProbe = false)
    val probe = PhashIndexStream.bandsOf(2L, 5L, 9L, isProbe = true)
    val input = MemoryStream[PhashKey]
    val q = PhashIndexStream.hits(input.toDS())
      .writeStream.format("memory").queryName("phash_replay")
      .outputMode("append").start()
    input.addData(reg); q.processAllAvailable()
    input.addData(reg) // at-least-once source replays the registration
    q.processAllAvailable()
    input.addData(probe); q.processAllAvailable()
    q.stop()
    val emitted = spark.table("phash_replay").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // identical hashes: hamming 0, one hit per shared band (all 4),
    // NOT 8 (the doubled posting a replay would have left)
    assert(emitted.toSeq.sorted === Seq.fill(4)((2L, 1L, 0L)))
  }
}

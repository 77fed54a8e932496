package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.hash.Fnv1a32

class MultimodalSpec extends SparkSpec {

  test("catalog: binary payload with typed, prunable metadata") {
    val df = Multimodal.catalog(spark, sf)
    val sch = df.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(sch("payload") === "binary")
    assert(sch("media_type") === "string")
    assert(sch("width") === "int" && sch("height") === "int")
    val types = df.select("media_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types === Set("image", "audio", "video"))
  }

  test("decode runs batched per partition and preserves every row") {
    val feats = Multimodal.decoded(spark, sf)
    assert(feats.count() ===
      spark.read.parquet(s"$sf/documents.parquet").count())
    // checksum really is the container hash: cross-check one row per
    // modality against a driver-side re-encode of its real container
    val docs = Multimodal.catalog(spark, sf)
      .select("doc_id", "media_type").orderBy("doc_id").limit(50).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val vidId = docs.find(_._2 == "video").get._1
    val audId = docs.find(_._2 == "audio").get._1
    val imgId = docs.find(_._2 == "image").get._1
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id").isin(vidId, audId, imgId))
      .collect().map(r => r.getLong(r.fieldIndex("doc_id")) ->
        r.getString(r.fieldIndex("text"))).toMap
    val byId = feats.filter(col("doc_id").isin(vidId, audId, imgId))
      .collect().map(f => f.doc_id -> f).toMap
    val y4m = Multimodal.encodeY4mAsset(vidId, texts(vidId).getBytes("UTF-8"))
    assert(byId(vidId).checksum === Fnv1a32.hashBytes(y4m))
    assert(byId(vidId).n_bytes === y4m.length.toLong)
    // video byte_sum is the decoded planes only (headers + markers off)
    val vParsed = Y4m.parse(y4m).get
    assert(byId(vidId).byte_sum ===
      vParsed.frames.flatMap(_.map(b => (b & 0xff).toLong)).sum)
    val ppm = Multimodal.encodePpm(imgId, texts(imgId).getBytes("UTF-8"))
    assert(byId(imgId).checksum === Fnv1a32.hashBytes(ppm))
    assert(byId(imgId).n_bytes === ppm.length.toLong)
    // image byte_sum is the DECODED raster only (header excluded)
    val hdrLen = s"P6\n${Multimodal.ppmW(imgId)} ${Multimodal.ppmH(imgId)}\n255\n".length
    assert(byId(imgId).byte_sum ===
      ppm.drop(hdrLen).map(b => (b & 0xff).toLong).sum)
    val wav = Multimodal.encodeWavAsset(audId, texts(audId).getBytes("UTF-8"))
    assert(byId(audId).checksum === Fnv1a32.hashBytes(wav))
    assert(byId(audId).n_bytes === wav.length.toLong)
    // audio byte_sum is the data chunk's samples only (44-byte header off)
    assert(byId(audId).byte_sum ===
      wav.drop(44).map(b => (b & 0xff).toLong).sum)
  }

  test("pipeline partitions by media_type before decoding") {
    val plan = Multimodal.decoded(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(media_type"), plan.take(1500))
  }

  test("decode stage runs wider than #media-types with type-contiguous rows") {
    val perPart = Multimodal.decoded(spark, sf).rdd.mapPartitions { it =>
      val types = it.map(_.media_type).toArray
      Iterator.single((types.length, types.sameElements(types.sorted)))
    }.collect()
    val nonEmpty = perPart.count(_._1 > 0)
    assert(nonEmpty > 3,
      s"decode parallelism capped at $nonEmpty partitions — must exceed the 3 media types")
    assert(perPart.forall(_._2),
      "rows within each partition must be contiguous (sorted) by media_type")
  }

  test("quarantine routes exactly the corrupted assets, rest still parse") {
    val q = Multimodal.queries("media_quarantine")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(q.nonEmpty)
    // exactly the deterministic corruption set, nothing else — all
    // three modalities validate now
    q.foreach { case (id, _) =>
      assert(id % Multimodal.CorruptEvery === 0)
    }
    val expected = Multimodal.catalog(spark, sf)
      .select("doc_id", "media_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter { case (id, _) => id % Multimodal.CorruptEvery == 0 }
    assert(q.toSet === expected.toSet)
    // and the un-corrupted assets all still parse under the same feed
    import spark.implicits._
    val unparsed = Multimodal.corruptedAssets(spark, sf).as[MediaRow]
      .filter(r => r.doc_id % Multimodal.CorruptEvery != 0)
      .filter(r => r.media_type match {
        case "image" => Ppm.parse(r.payload).isEmpty
        case "audio" => Wav.parse(r.payload).isEmpty
        case "video" => Y4m.parse(r.payload).isEmpty
        case _ => false
      }).count()
    assert(unparsed === 0L)
  }

  test("augment plan: in-range params, image-subset coverage, rerun-stable") {
    val imgs = Multimodal.catalog(spark, sf)
      .filter(col("media_type") === "image").count()
    def run() = Multimodal.queries("media_augment_plan")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    val rows = run()
    assert(rows.length === imgs)
    rows.foreach { case (_, w, h, flip, cx, cy, b) =>
      assert(flip === 0L || flip === 1L)
      assert(cx >= 0 && cx <= w - Multimodal.CropW)
      assert(cy >= 0 && cy <= h - Multimodal.CropH)
      assert(b >= -10 && b <= 10)
    }
    // the whole point: a rerun deals identical augmentations
    assert(rows === run())
  }

  test("vad segments are consistent with the vad frame counts and " +
      "bound by the trim points") {
    val vad = Multimodal.queries("media_audio_vad")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val segs = Multimodal.queries("media_vad_segments")(spark, sf).collect()
    assert(segs.nonEmpty)
    segs.foreach { r =>
      val (doc, nFrames, nActive) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (nSeg, longest) = (r.getLong(3), r.getLong(4))
      val (first, last) = (r.getLong(5), r.getLong(6))
      assert((nFrames, nActive) == vad(doc), s"doc $doc frame counts")
      if (nActive == 0) {
        assert(nSeg == 0 && longest == 0 && first == -1 && last == -1)
      } else {
        assert(nSeg >= 1 && nSeg <= nActive, s"doc $doc segments")
        assert(longest >= 1 && longest <= nActive, s"doc $doc longest")
        // nActive active frames in nSeg runs: the longest run is at
        // least the ceiling average and fits inside the trim span
        assert(longest >= (nActive + nSeg - 1) / nSeg, s"doc $doc pigeonhole")
        assert(first >= 0 && last >= first && last < nFrames)
        assert(last - first + 1 >= nActive, s"doc $doc span")
      }
    }
  }

  test("image phash: every image hashed, halves stay in 32 unsigned bits") {
    val rows = Multimodal.queries("media_image_phash")(spark, sf).collect()
    val nImages = Multimodal.mediaAssets(spark, sf)
      .filter(col("media_type") === "image").count()
    assert(rows.length.toLong == nImages)
    rows.foreach { r =>
      assert(r.getLong(1) >= 8 && r.getLong(1) <= 15, "width rule")
      assert(r.getLong(2) >= 6 && r.getLong(2) <= 11, "height rule")
      assert(r.getLong(3) >= 0L && r.getLong(3) < (1L << 32), "hi half")
      assert(r.getLong(4) >= 0L && r.getLong(4) < (1L << 32), "lo half")
    }
  }

  test("phash near-dup: banded candidates + verify EXACTLY reproduce the " +
      "brute-force hamming gate, and the fixture has a real pair") {
    val ph = Multimodal.queries("media_image_phash")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    val brute = (for {
      (a, ahi, alo) <- ph; (b, bhi, blo) <- ph if a < b
      d = java.lang.Long.bitCount(ahi ^ bhi) +
        java.lang.Long.bitCount(alo ^ blo)
      if d <= Multimodal.PhashHammingMax
    } yield (a, b, d.toLong)).toSet
    val banded = Multimodal.queries("media_phash_neardup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == brute,
      s"banding is not exact-cover: banded=$banded brute=$brute")
    assert(brute.nonEmpty, "no near-dup image pair at this SF — vacuous")
  }

  test("crossmodal visual agreement: image-typed text near-dups carry " +
      "their visual verdict; visual agreement requires matching dims") {
    val rows = Multimodal.queries("crossmodal_visual_agreement")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getBoolean(4)))
    assert(rows.nonEmpty, "no image-typed near-dup text pair — vacuous")
    rows.foreach { case (a, b, jac, ham, _) =>
      assert(a < b && jac >= graft.dedup.DedupQueries.JaccardThreshold)
      assert(ham >= 0 && ham <= 64, s"($a,$b) hamming $ham")
    }
    // the measurement's point: on this fixture (and for any pipeline
    // rendering the same text at doc-specific geometry) visual
    // near-agreement only happens when the render dims match
    rows.filter(_._4 <= Multimodal.PhashHammingMax).foreach { r =>
      assert(r._5, s"visually-near pair ${(r._1, r._2)} with differing dims")
    }
  }

  test("scene cuts: non-vacuous both ways (the round-8 drop reason), " +
      "every cut sits on a segment boundary, every decode succeeded") {
    val rows = Multimodal.queries("media_scene_cuts")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(rows.forall(_._2 >= 1), "a -1 frame row means a parse failure")
    val (cut, noCut) = rows.partition(_._4)
    assert(cut.nonEmpty, "no cut detected at this SF — vacuous exhibit")
    assert(noCut.nonEmpty, "every boundary a cut — threshold is vacuous")
    // the synthesis only changes its text offset every SegLen frames, so
    // a detected cut can ONLY sit where f % SegLen == 0; within-segment
    // deltas are exactly 1/byte (the +f ramp), far under the gate
    cut.foreach { case (d, f, _, _) =>
      assert(f % Multimodal.SegLen == 0, s"cut at non-boundary ($d, $f)")
    }
    // within-segment deltas are exactly 1 per plane byte
    rows.filterNot(_._2 % Multimodal.SegLen == 0).foreach {
      case (d, f, delta, _) =>
        val w = 4 + d % 4; val h = 3 + d % 3
        assert(delta == 3 * w * h, s"within-segment delta ($d, $f) $delta")
    }
  }

  test("audio fingerprints discriminate (the round-8 drop reason: 80 " +
      "distinct / 175 clips) and replay the engine's bit packing") {
    val rows = Multimodal.queries("media_audio_fingerprint")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.forall(_._2 > 0), "a -1 window row means a parse failure")
    val distinct = rows.map(_._3).distinct.length
    assert(distinct * 10 >= rows.length * 9,
      s"fingerprint collapse: $distinct distinct over ${rows.length} clips")
    // replay one clip's fingerprint from the raw synthesis driver-side
    val (d, nw, fp) = rows.head
    val text = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") === d).head.getAs[String]("text")
      .getBytes("UTF-8")
    val n = Multimodal.wavN(d)
    val e = Array.tabulate(n / Multimodal.AudioHop) { w =>
      (0 until Multimodal.AudioHop).map { j =>
        val c = Multimodal.wavFpSample(text, w * Multimodal.AudioHop + j) - 128
        c.toLong * c
      }.sum
    }
    assert(nw == e.length)
    var expect = 0L
    for (w <- 0 until math.min(e.length - 1, 63))
      if (e(w + 1) > e(w)) expect |= 1L << w
    assert(fp == expect, s"doc $d fingerprint $fp != replay $expect")
  }
}

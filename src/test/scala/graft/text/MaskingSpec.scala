package graft.text

import graft.SparkSpec
import graft.hash.Fnv1a32

/** The span plan against a token-by-token driver-side replay of the
  * hash chain, plus the plan's accounting laws. */
class MaskingSpec extends SparkSpec {

  private def mix32(h: Long): Long = {
    def round(x: Long): Long =
      (((x ^ (x >>> 16)) * 73244475L) % 4294967296L + 4294967296L) %
        4294967296L
    val m2 = round(round(h))
    m2 ^ (m2 >>> 16)
  }

  test("span plan: per-doc ledger equals the replayed hash chain") {
    val got = MaskingQueries.queries("corpus_span_mask_plan")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.size == docs.length)
    docs.foreach { case (id, text) =>
      val n = text.split(" ", -1).length
      val sel = (0 until n).map { pos =>
        mix32(Fnv1a32.hashString(s"$id:$pos")) % 10000 <
          MaskingQueries.StartPerMyriad
      }
      val masked = (0 until n).map { pos =>
        (math.max(0, pos - MaskingQueries.SpanLen + 1) to pos)
          .exists(sel)
      }
      val spans = (0 until n).count(p => masked(p) && (p == 0 || !masked(p - 1)))
      val (gn, gs, gm, gsp, rate) = got(id)
      assert(gn == n.toLong, s"doc $id n_tok")
      assert(gs == sel.count(identity).toLong, s"doc $id starts")
      assert(gm == masked.count(identity).toLong, s"doc $id masked")
      assert(gsp == spans.toLong, s"doc $id spans")
      assert(rate == masked.count(identity).toDouble / n)
      // accounting laws: spans cover starts, each span covers <= SpanLen
      // tokens per start, masked >= starts
      assert(gm >= gs && gm <= gs * MaskingQueries.SpanLen)
      assert(gsp <= gs)
    }
    // corpus-level: the realized corruption is in the designed band
    val totTok = got.values.map(_._1).sum.toDouble
    val totMasked = got.values.map(_._3).sum.toDouble
    assert(totMasked / totTok > 0.10 && totMasked / totTok < 0.20,
      s"corpus corruption ${totMasked / totTok} outside the 15% band")
  }

  test("span emit: reconstruction law — input + target rebuild the doc") {
    val rows = MaskingQueries.queries("corpus_span_mask_emit")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(rows.length == docs.size)
    val sentinel = "<X_(\\d+)>".r
    rows.foreach { case (id, nTok, nSpans, nVisible, input, target) =>
      // substituting each sentinel's span text back into the input must
      // reproduce the original document exactly
      val spans = sentinel.findAllMatchIn(target).toSeq
      val bounds = spans.map(_.start) :+ target.length
      val spanText = spans.zipWithIndex.map { case (m, i) =>
        m.group(1).toInt -> target.substring(m.end, bounds(i + 1)).trim
      }.toMap
      val rebuilt = sentinel.replaceAllIn(input,
        m => java.util.regex.Matcher.quoteReplacement(
          spanText(m.group(1).toInt)))
      assert(rebuilt == docs(id), s"doc $id: reconstruction broke")
      assert(nSpans == spanText.size.toLong)
      // visible tokens + hidden span tokens account for every token
      val hidden = spanText.values.map(_.split(" ", -1).length).sum
      if (nSpans > 0)
        assert(nVisible + hidden == nTok, s"doc $id: token accounting")
      else assert(nVisible == nTok && target.isEmpty)
    }
  }
}

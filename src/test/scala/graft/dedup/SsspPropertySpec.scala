package graft.dedup

import scala.util.Random

import graft.SparkSpec

/** The SSSP relaxation against multi-source Dijkstra on seeded random
  * graphs — topologies the fixture's near-dup cliques never produce
  * (long chains, cross-component bridges-that-aren't, weight ties). */
class SsspPropertySpec extends SparkSpec {

  private def dijkstra(edges: Seq[(Long, Long, Long)],
      sources: Seq[Long]): Map[Long, Long] = {
    val adj = edges.flatMap { case (a, b, w) => Seq(a -> (b, w), b -> (a, w)) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val dist = collection.mutable.Map(sources.map(_ -> 0L): _*)
    val pq = collection.mutable.PriorityQueue(
      sources.map(s => (0L, s)): _*)(Ordering.by(t => -t._1))
    while (pq.nonEmpty) {
      val (d, u) = pq.dequeue()
      if (d == dist(u))
        adj.getOrElse(u, Seq.empty).foreach { case (v, w) =>
          if (dist.get(v).forall(_ > d + w)) {
            dist(v) = d + w
            pq.enqueue((d + w, v))
          }
        }
    }
    dist.toMap
  }

  test("random graphs: relaxation = Dijkstra, rounds within the hop cap") {
    import spark.implicits._
    for (seed <- Seq(3, 17, 42)) {
      val rnd = new Random(seed)
      val n = 40
      // sparse random graph + a long chain (the worst case for round
      // counts) — jaccards in [0.5, 1) so every edge survives the
      // operator's threshold semantics
      val chain = (0 until 10).map(i => (i.toLong, i + 1L))
      val extra = (0 until 50).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2)
      val pairs = (chain ++ extra).distinct
        .map { case (a, b) => (a, b, 0.5 + rnd.nextDouble() * 0.499) }
      val scored = pairs.toDF("doc_a", "doc_b", "jaccard")

      val (df, rounds) = DedupComponents.ssspFromCanonicalsWithRounds(scored)
      val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(rounds <= DedupComponents.SsspMaxHops, s"seed $seed: $rounds")

      val wEdges = pairs.map { case (a, b, j) =>
        (a, b, math.floor((1.0 - j) * DedupComponents.SsspFp + 0.5).toLong)
      }
      // canonicals = min id per connected component (the operator's rule)
      val verts = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      val parent = collection.mutable.Map(verts.map(v => v -> v): _*)
      def find(v: Long): Long =
        if (parent(v) == v) v else { parent(v) = find(parent(v)); parent(v) }
      pairs.foreach { case (a, b, _) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val sources = verts.map(find).distinct
      val expect = dijkstra(wEdges, sources).map { case (k, d) =>
        k -> d.toDouble / DedupComponents.SsspFp
      }
      assert(got === expect, s"seed $seed diverged")
    }
  }

}

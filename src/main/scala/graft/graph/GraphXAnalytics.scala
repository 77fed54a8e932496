package graft.graph

import org.apache.spark.graphx.{Edge, Graph, PartitionStrategy}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.{DedupComponents, DedupQueries}

/** GraphX implementations of the graph analytics (the north-star approach
  * for the reference's aspirational graph phase — `ARCHITECTURE.md:744-751`
  * planned graph traversals that were never built).
  *
  * GraphX runs the same dataflow as the DataFrame versions but over
  * RDD-partitioned vertex/edge tables with Pregel-style message passing —
  * the right tool once iteration counts grow (its vertex cuts and
  * in-memory replication amortize across many supersteps, where the
  * DataFrame loop pays a shuffle per round). Connected components here is
  * oracle-checked against the same recursive-CTE closure as the DataFrame
  * variant, proving the two implementations agree.
  */
object GraphXAnalytics {

  /** Connected components of an undirected (doc_a, doc_b) edge list via
    * GraphX; labels are the min vertex id, matching both the DataFrame
    * label propagation and the SQL transitive closure. */
  def connectedComponents(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val edgeRdd = edges.select("doc_a", "doc_b").rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), 1))
    Graph.fromEdges(edgeRdd, defaultValue = 0)
      .connectedComponents()
      .vertices
      .toDF("doc_id", "component")
  }

  /** Per-vertex triangle counts of an undirected canonical (doc_a < doc_b)
    * edge list via GraphX's clustering-coefficient kernel. Edge partitions
    * ship neighbor sets, not the corpus — the distributed-join shape of
    * triangle enumeration; the vertex-cut `partitionBy` bounds replication
    * at high-degree vertices. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val edgeRdd = edges.select("doc_a", "doc_b").rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), 1))
    Graph.fromEdges(edgeRdd, defaultValue = 0)
      .partitionBy(PartitionStrategy.RandomVertexCut)
      .triangleCount()
      .vertices
      .toDF("doc_id", "n_tri")
      .select(col("doc_id"), col("n_tri").cast("long").as("n_triangles"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_components_graphx" -> ((s, dir) => {
      val pairs = DedupQueries.queries("dedup_ngram_jaccard")(s, dir)
        .select("doc_a", "doc_b")
      connectedComponents(pairs)
        .withColumn("is_canonical", col("doc_id") === col("component"))
        .orderBy("doc_id")
    }),

    // triangles per vertex of the near-dup graph — the cluster-cohesion
    // signal a curation pipeline reads before collapsing a component to
    // its canonical doc (a triangle-dense component is a true duplicate
    // clique; a triangle-free star is one hub pairing with unrelated
    // near-misses). Oracle: three-way self-join of the canonical edge
    // list, unpivoted to per-vertex counts.
    "graph_triangle_count" -> ((s, dir) => {
      val pairs = DedupQueries.queries("dedup_ngram_jaccard")(s, dir)
        .select("doc_a", "doc_b")
      triangleCounts(pairs).orderBy("doc_id")
    }),

    // clustering-coefficient profile by degree: for each vertex degree,
    // how closed are the neighborhoods? coeff(d) = Σ2T / (n·d·(d-1)) —
    // the aggregate local clustering of that degree class. Degree-1
    // vertices have no wedges, so their coefficient is NULL (not 0/0 —
    // Spark runs ANSI and the CASE keeps both engines agreeing). All
    // sums are BIGINT (triangle counts, node counts); the single double
    // division happens once per output row, so the result hash-matches
    // DuckDB exactly. Scale: degrees and triangles are vertex-sized
    // reductions of the edge list; the histogram is ≤ max-degree rows.
    "graph_clustering_coeff" -> ((s, dir) => {
      val pairs = DedupQueries.queries("dedup_ngram_jaccard")(s, dir)
        .select("doc_a", "doc_b").localCheckpoint()
      val deg = pairs.select(col("doc_a").as("doc_id"))
        .unionAll(pairs.select(col("doc_b").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("degree"))
      deg.join(triangleCounts(pairs), "doc_id")
        .groupBy("degree")
        .agg(count(lit(1)).as("n_nodes"),
          sum("n_triangles").as("n_triangles"))
        .withColumn("coeff",
          when(col("degree") >= 2,
            (col("n_triangles") * 2L).cast("double") /
              (col("n_nodes") * col("degree") * (col("degree") - 1L))
                .cast("double"))
            .otherwise(lit(null).cast("double")))
        .orderBy("degree")
    }),
  )

  /** Same closure oracle as the DataFrame variant — both must agree. */
  val oracle: Map[String, String] = Map(
    "dedup_components_graphx" ->
      DedupComponents.oracle("dedup_components"),

    "graph_triangle_count" -> (s"WITH ${DedupQueries.jaccardPairsSql},\n" +
      s"""e AS (SELECT doc_a, doc_b FROM jac
         |      WHERE jaccard >= ${DedupQueries.JaccardThreshold}),
         |tri AS (
         |  SELECT ab.doc_a AS a, ab.doc_b AS b, bc.doc_b AS c
         |  FROM e ab
         |  JOIN e bc ON ab.doc_b = bc.doc_a
         |  JOIN e ac ON ac.doc_a = ab.doc_a AND ac.doc_b = bc.doc_b
         |),
         |per AS (
         |  SELECT v, count(*) AS n FROM (
         |    SELECT a AS v FROM tri
         |    UNION ALL SELECT b FROM tri
         |    UNION ALL SELECT c FROM tri
         |  ) GROUP BY v
         |),
         |verts AS (
         |  SELECT doc_a AS v FROM e UNION SELECT doc_b FROM e
         |)
         |SELECT v AS doc_id, CAST(coalesce(n, 0) AS BIGINT) AS n_triangles
         |FROM verts LEFT JOIN per USING (v) ORDER BY doc_id""".stripMargin),

    "graph_clustering_coeff" -> (s"WITH ${DedupQueries.jaccardPairsSql},\n" +
      s"""e AS (SELECT doc_a, doc_b FROM jac
         |      WHERE jaccard >= ${DedupQueries.JaccardThreshold}),
         |tri AS (
         |  SELECT ab.doc_a AS a, ab.doc_b AS b, bc.doc_b AS c
         |  FROM e ab
         |  JOIN e bc ON ab.doc_b = bc.doc_a
         |  JOIN e ac ON ac.doc_a = ab.doc_a AND ac.doc_b = bc.doc_b
         |),
         |per AS (
         |  SELECT v, count(*) AS n FROM (
         |    SELECT a AS v FROM tri
         |    UNION ALL SELECT b FROM tri
         |    UNION ALL SELECT c FROM tri
         |  ) GROUP BY v
         |),
         |deg AS (
         |  SELECT v, count(*) AS degree FROM (
         |    SELECT doc_a AS v FROM e UNION ALL SELECT doc_b FROM e
         |  ) GROUP BY v
         |),
         |byd AS (
         |  SELECT degree, count(*) AS n_nodes,
         |         CAST(sum(coalesce(n, 0)) AS BIGINT) AS n_triangles
         |  FROM deg LEFT JOIN per USING (v) GROUP BY degree
         |)
         |SELECT degree, n_nodes, n_triangles,
         |       CASE WHEN degree >= 2
         |         THEN CAST(n_triangles * 2 AS DOUBLE)
         |              / CAST(n_nodes * degree * (degree - 1) AS DOUBLE)
         |         ELSE NULL END AS coeff
         |FROM byd ORDER BY degree""".stripMargin),
  )
}

package graft.graph

import org.apache.spark.graphx.{Edge, Graph}
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_components_graphx" -> ((s, dir) => {
      val pairs = DedupQueries.queries("dedup_ngram_jaccard")(s, dir)
        .select("doc_a", "doc_b")
      connectedComponents(pairs)
        .withColumn("is_canonical", col("doc_id") === col("component"))
        .orderBy("doc_id")
    }),
  )

  /** Same closure oracle as the DataFrame variant — both must agree. */
  val oracle: Map[String, String] = Map(
    "dedup_components_graphx" ->
      DedupComponents.oracle("dedup_components"))
}

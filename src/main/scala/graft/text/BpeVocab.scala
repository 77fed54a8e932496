package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import TextQueries.BpeTrainIters

/** The persisted build/serve split for the BPE tokenizer — the third
  * trainable artifact to get the treatment (after the IVF-PQ vector
  * index and the LSH dedup index): `text_bpe_train` demonstrates the
  * training LOOP; this object persists its product (the ordered merge
  * list — the entire tokenizer) and serves tokenization from it.
  *
  * Serving is where the split pays: with the merges as LITERALS, the
  * whole tokenizer compiles into ONE codegen projection — a chain of
  * [[BpeTrainIters]] `replace` calls over the bracketed symbol string —
  * applied in a single corpus scan with a map-side per-doc aggregate.
  * No iteration, no joins, no vocab table at query time: the classic
  * "training is iterative, inference is a map" asymmetry.
  *
  * The merge list is a deterministic function of the corpus, so the
  * served statistics equal what the in-query training chain would
  * produce — the oracle recomputes the merges in SQL and applies them
  * the same way. */
object BpeVocab {

  /** Fingerprinted cache key — see [[graft.sources.IndexCache]]: a
    * regenerated fixture retrains instead of serving stale merges. */
  def indexPath(s: SparkSession, dir: String): String =
    graft.sources.IndexCache.path(s, dir, "bpe", "documents", "doc_id")

  private def bracketed(c: org.apache.spark.sql.Column) =
    concat_ws("", transform(split(c, ""), ch => concat(lit("<"), ch, lit(">"))))

  /** Run the training loop (identical math to `text_bpe_train`) and
    * persist the ordered merge list: (iter, pair, repl). */
  def build(s: SparkSession, dir: String, path: String): Unit = {
    // iterative loop → graft.Materialize (mode-selectable fault
    // tolerance); each round's vocab supersedes the previous one, which
    // is released as soon as the new round is materialized
    var v = s.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count("*").as("freq"))
      .select(bracketed(col("w")).as("r"), col("freq"))
      .transform(graft.Materialize(_))
    val rows = (1 to BpeTrainIters).map { i =>
      val pair = v
        .select(col("freq"),
          expr("split(substring(r, 2, length(r) - 2), '><')").as("syms"))
        .select(col("freq"), explode(when(size(col("syms")) >= 2,
            expr("transform(sequence(0, size(syms) - 2), i -> concat(" +
              "'<', element_at(syms, CAST(i + 1 AS INT)), '><', " +
              "element_at(syms, CAST(i + 2 AS INT)), '>'))"))
            .otherwise(array().cast("array<string>"))).as("pair"))
        .groupBy("pair").agg(sum("freq").as("n"))
        .orderBy(col("n").desc, col("pair")).limit(1)
        .head().getString(0)
      val repl = pair.replace("><", "")
      val prev = v
      v = v.select(
          call_function("replace", col("r"), lit(pair), lit(repl)).as("r"),
          col("freq"))
        .transform(graft.Materialize(_))
      graft.Materialize.release(prev)
      (i.toLong, pair, repl)
    }
    // the merges are driver-side rows; the final vocab frame is dead
    graft.Materialize.release(v)
    import s.implicits._
    rows.toDF("iter", "pair", "repl").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/merges")
  }

  private val lock = new Object

  def buildIfMissing(s: SparkSession, dir: String): String =
    lock.synchronized {
      val path = indexPath(s, dir)
      if (!new java.io.File(s"$path/merges/_SUCCESS").exists())
        build(s, dir, path)
      path
    }

  /** The ordered merge list from the persisted tokenizer. */
  def merges(s: SparkSession, dir: String): Seq[(String, String)] = {
    val path = buildIfMissing(s, dir)
    s.read.parquet(s"$path/merges").orderBy("iter").collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[String]("repl"))).toSeq
  }

  /** Tokenize the corpus with the PERSISTED tokenizer: the merge chain
    * as literal `replace`s — one codegen projection, one corpus scan,
    * per-doc token statistics out. */
  def tokenizeServed(s: SparkSession, dir: String): DataFrame = {
    val ms = merges(s, dir)
    val dw = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val merged = ms.foldLeft(bracketed(col("w"))) { case (acc, (p, q)) =>
      call_function("replace", acc, lit(p), lit(q))
    }
    dw
      .select(col("doc_id"), col("c"),
        length(col("w")).cast("long").as("syms_before"),
        (length(merged) -
          length(call_function("replace", merged, lit("<"), lit(""))))
          .cast("long").as("toks"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_words"),
        sum(col("c") * col("syms_before")).as("n_syms_before"),
        sum(col("c") * col("toks")).as("n_tokens"))
      .select(col("doc_id"), col("n_words"), col("n_syms_before"),
        col("n_tokens"),
        (col("n_tokens").cast("double") /
          col("n_syms_before").cast("double")).as("compression"))
      .orderBy("doc_id")
  }
}

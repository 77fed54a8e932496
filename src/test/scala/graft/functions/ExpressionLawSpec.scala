package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sim.Dot64

/** The custom codegen expressions must be drop-in equivalents of the
  * built-in higher-order-function pipelines they replace — checked on
  * randomized inputs.
  */
class ExpressionLawSpec extends SparkSpec {
  import spark.implicits._

  test("WordNgrams ≡ array_distinct(transform(sequence, concat_ws))") {
    val rnd = new Random(7)
    val vocab = Seq("a", "b", "c", "d")
    val texts = (0 until 100).map { _ =>
      (0 until rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(4))).mkString(" ")
    }
    val df = texts.toDF("text")
      .select(split(col("text"), " ").as("toks"))
      .select(
        WordNgrams.wordNgrams(col("toks"), 3).as("fast"),
        when(size(col("toks")) >= 3,
          array_distinct(transform(sequence(lit(0), size(col("toks")) - 3),
            i => concat_ws(" ", element_at(col("toks"), i + 1),
              element_at(col("toks"), i + 2), element_at(col("toks"), i + 3)))))
          .otherwise(array().cast("array<string>")).as("ref"))
    val bad = df.filter(not(col("fast") === col("ref"))).count()
    assert(bad === 0)
  }

  test("Dot64 ≡ aggregate(zip_with(*, +)) bit-for-bit on random vectors") {
    val rnd = new Random(11)
    val vecs = (0 until 50).map { _ =>
      ((0 until 64).map(_ => rnd.nextFloat() - 0.5f),
        (0 until 64).map(_ => rnd.nextFloat() - 0.5f))
    }
    val df = vecs.toDF("a", "b").select(
      Dot64.dot64(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("ref"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }
}

package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose probe side has hot keys.
  *
  * A hash join on a key where 30% of rows share one value lands 30% of the
  * data on one task. Salting splits each hot key across `buckets` tasks:
  * the big side gets a deterministic per-row salt, the small side is
  * replicated once per salt value, and the join runs on (key, salt). The
  * salt derives from a hash of the whole row, so the split is even and the
  * plan stays deterministic. Complements AQE's skew-join splitting (which
  * only rescues sort-merge joins) — salting also works for broadcast and
  * aggregate-feeding joins.
  */
object Salting {

  def saltedJoin(big: DataFrame, small: DataFrame, key: Seq[String],
      buckets: Int, joinType: String = "inner"): DataFrame = {
    val saltSrc = big.columns.map(col).toSeq
    val salted = big.withColumn("_salt",
      pmod(hash(saltSrc: _*), lit(buckets)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, key :+ "_salt", joinType).drop("_salt")
  }
}

package graft.oracle

/** DuckDB SQL snippet builders shared by every `SparkEntry.oracleSql` entry.
  *
  * The driver's correctness gate runs these statements in DuckDB against the
  * same parquet tables the Spark queries read, then compares row/schema/hash.
  * Everything here must therefore be (a) valid DuckDB SQL and (b) bit-for-bit
  * equivalent to the Spark-side derivation.
  */
object Ora {

  /** FNV-1a 32-bit over the characters of `e` — DuckDB equivalent of
    * [[graft.hash.Fnv1a32]]. Uses code points, so it is only byte-exact for
    * ASCII keys; all oracle-checked fixtures use ASCII keys (Unicode keys are
    * covered by ScalaTest known-answer vectors instead). */
  def fnv(e: String): String =
    s"list_reduce(list_prepend(2166136261::BIGINT, " +
      s"list_transform(string_split($e, ''), c -> unicode(c)::BIGINT)), " +
      s"(h, b) -> ((xor(h, b)) * 16777619) % 4294967296)"

  /** FNV-1a 32-bit over a LIST of byte values (BIGINTs in [0, 255]) —
    * for payloads that are genuine binary (e.g. the PPM containers),
    * where the string-based [[fnv]] cannot represent bytes >= 0x80. The
    * caller supplies the byte list expression; the fold is the identical
    * `(h ^ b) * prime mod 2^32` chain as [[graft.hash.Fnv1a32]]. */
  def fnvBytes(e: String): String =
    s"list_reduce(list_prepend(2166136261::BIGINT, $e), " +
      s"(h, b) -> ((xor(h, b)) * 16777619) % 4294967296)"

  /** key → shard id (numShards = 4), BIGINT. */
  def shard(e: String): String = s"(${fnv(e)} % 4)"

  /** The kv operation-log fixture, derived deterministically from `orders`.
    * Mirror of [[graft.keyspace.KvLog.log]] — keep the two in lockstep.
    *
    * - every order        → put  (seq = 8k)   key 'order:<k>' value '<status>:<priority>:<custkey>'
    * - orderkey % 97 = 0  → put  (seq = 8k+1) value 'updated:<custkey>'   (LWW overwrite)
    * - orderkey % 103 = 0 → put  (seq = 8k+2) value ''                    (empty value — legal, store.go:84)
    * - orderkey % 101 = 0 → delete (seq = 8k+4)                           (tombstone)
    * - orderkey % 5 = 0   → get  (seq = 8k+6)                             (read traffic; no state effect)
    * - orderkey % 25 = 0  → get  (seq = 8k+7)                             (read skew: 2nd get)
    * - orderkey % 125 = 0 → get  (seq = 8k+3)                             (read skew: 3rd get)
    */
  val kvLog: String =
    """kv_log AS (
      |  SELECT o_orderkey * 8 AS seq, 'put' AS op,
      |         'order:' || o_orderkey AS key,
      |         o_orderstatus || ':' || o_orderpriority || ':' || o_custkey AS value
      |  FROM orders
      |  UNION ALL
      |  SELECT o_orderkey * 8 + 1, 'put', 'order:' || o_orderkey,
      |         'updated:' || o_custkey
      |  FROM orders WHERE o_orderkey % 97 = 0
      |  UNION ALL
      |  SELECT o_orderkey * 8 + 2, 'put', 'order:' || o_orderkey, ''
      |  FROM orders WHERE o_orderkey % 103 = 0
      |  UNION ALL
      |  SELECT o_orderkey * 8 + 4, 'delete', 'order:' || o_orderkey, NULL
      |  FROM orders WHERE o_orderkey % 101 = 0
      |  UNION ALL
      |  SELECT o_orderkey * 8 + 6, 'get', 'order:' || o_orderkey, NULL
      |  FROM orders WHERE o_orderkey % 5 = 0
      |  UNION ALL
      |  SELECT o_orderkey * 8 + 7, 'get', 'order:' || o_orderkey, NULL
      |  FROM orders WHERE o_orderkey % 25 = 0
      |  UNION ALL
      |  SELECT o_orderkey * 8 + 3, 'get', 'order:' || o_orderkey, NULL
      |  FROM orders WHERE o_orderkey % 125 = 0
      |)""".stripMargin

  /** Last-write-wins compaction of [[kvLog]] → current keyspace state.
    * Mirror of [[graft.keyspace.KvLog.state]] — writes only; `get` ops are
    * counter traffic and never reach compaction. */
  val kvState: String =
    s"""$kvLog,
       |kv_state AS (
       |  SELECT key, value, ${shard("key")} AS shard_id FROM (
       |    SELECT key, arg_max(value, seq) AS value, arg_max(op, seq) AS op
       |    FROM kv_log WHERE op IN ('put', 'delete') GROUP BY key
       |  ) WHERE op = 'put'
       |)""".stripMargin

  /** Full statement with the kv_state CTE prefix. */
  def withState(body: String): String = s"WITH $kvState\n$body"

  /** Ordered left-fold dot product of two n-dim FLOAT/DOUBLE lists in
    * DOUBLE — the exact op sequence of the codegen'd `dot64` expression
    * (which is length-generic despite the name), so the resulting doubles
    * are bit-identical across engines at any dimension. */
  def dotN(a: String, b: String, n: Int): String =
    s"list_reduce(list_transform(range($n), i -> " +
      s"$a[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x, y) -> x + y)"

  /** [[dotN]] at the embedding table's native 64 dims. */
  def dot64(a: String, b: String): String = dotN(a, b, 64)

  /** Same fold against a literal ±1 hyperplane. */
  def dotLit64(a: String, w: Seq[Double]): String = {
    val lst = w.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
    s"list_reduce(list_transform(range(64), i -> " +
      s"$a[i+1]::DOUBLE * ($lst)[i+1]), (x, y) -> x + y)"
  }

  /** Cosine similarity matching [[graft.sim.SimilarityQueries.cosine]]. */
  def cos64(a: String, b: String): String =
    s"${dot64(a, b)} / (sqrt(${dot64(a, a)}) * sqrt(${dot64(b, b)}))"

  /** Spark-definition interpolated percentile as an aggregate SQL
    * expression — the EXACT formula `Percentile.getPercentile` evaluates
    * (Spark sql/catalyst): with `pos = p · (n − 1)`, return the value at
    * `floor(pos)` when pos is integral, else
    * `(ceil(pos) − pos) · vlo + (pos − floor(pos)) · vhi` — the
    * symmetric two-product form, NOT `vlo + (vhi − vlo) · frac`, and
    * not DuckDB's `quantile_cont` fused interpolation; all three agree
    * mathematically but round differently, drifting 1 ulp at
    * fixture-dependent group sizes (first seen at the 10× gate:
    * `events_value_quantiles` p99; then `profile_embeddings` norm_p99
    * against the delta form at sf0.1). The two weights are computed by
    * subtraction of doubles within a factor of 2 (Sterbenz ⇒ exact), so
    * mirroring the product-product-add order reproduces Spark's bits.
    * p = 0 / 0.5 / 1 cannot drift under any of the forms (the products
    * are exact), which is why median-only sites keep `quantile_cont`.
    *
    * Requires the FROM source to be pre-ranked with `rn` (1-based
    * row_number ordered by the value ASC within the group) and `n` (the
    * group row count); `n` must be in the GROUP BY (it is functionally
    * dependent on the group keys). */
  def pct(v: String, p: String): String = {
    // p MUST be a DOUBLE: a bare 0.9 literal is DECIMAL(2,1) in DuckDB,
    // making pos exact-decimal where Spark's p·(n−1) carries the double
    // representation error — a 24-ulp drift on the weights, not 1
    val pos = s"($p::DOUBLE * (n - 1))"
    val vlo = s"min(CASE WHEN rn = CAST(floor($pos) AS BIGINT) + 1 " +
      s"THEN CAST($v AS DOUBLE) END)"
    val vhi = s"min(CASE WHEN rn = least(CAST(floor($pos) AS BIGINT) + 2, n) " +
      s"THEN CAST($v AS DOUBLE) END)"
    // the vlo = vhi arm mirrors Spark's lowerKey == higherKey early-out
    // (its counts-map holds one entry per DISTINCT value, so both
    // indexes inside a repeated-value run resolve to the same key and
    // return it UNinterpolated — the weighted sum of an equal pair can
    // round 1 ulp away from the value itself)
    s"""(CASE WHEN floor($pos) = ceil($pos) OR $vlo = $vhi THEN $vlo
       |      ELSE (ceil($pos) - $pos) * $vlo + ($pos - floor($pos)) * $vhi
       | END)""".stripMargin
  }
}

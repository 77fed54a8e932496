package graft.keyspace

import scala.util.Random

import graft.SparkSpec

/** The incremental-maintenance law on seeded random keyspaces: one
  * changed value moves exactly the MerkleLevels digests on the key's
  * path to the root, each by XOR of the old and new entry hashes — the
  * O(path) update a store applies per PUT instead of rebuilding. */
class MerklePropertySpec extends SparkSpec {

  test("random keyspace: one changed value moves exactly the merkle path") {
    import spark.implicits._
    import graft.hash.Fnv1a32.hashString
    val rnd = new Random(23)
    val keys = (0 until 120).map(i => s"k:${rnd.nextInt(100000)}:$i")
    def state(chg: Option[String]) = keys.map { k =>
      val v = if (chg.contains(k)) "CHANGED" else s"v${k.hashCode % 97}"
      (k, v, hashString(k) % 4)
    }.toDF("key", "value", "shard_id")
    def tree(df: org.apache.spark.sql.DataFrame) =
      KeyspaceQueries.merkleTree(df).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
        .toMap
    val k0 = keys(rnd.nextInt(keys.size))
    val (t0, t1) = (tree(state(None)), tree(state(Some(k0))))
    assert(t0.keySet === t1.keySet, "geometry must not change")
    val diffs = t0.keySet.filter(k => t0(k) != t1(k))
    // exactly one node per level: the changed key's path to the root
    assert(diffs.size === KeyspaceQueries.MerkleLevels)
    val shard = hashString(k0) % 4
    val leaf = (hashString(k0) >> 16) % KeyspaceQueries.MerkleLeaves
    val delta = hashString(s"$k0=v${k0.hashCode % 97}") ^
      hashString(s"$k0=CHANGED")
    (0 until KeyspaceQueries.MerkleLevels).foreach { l =>
      assert(diffs.contains((shard, l.toLong, leaf >> l)), s"level $l")
      val dd = t0((shard, l.toLong, leaf >> l)) ^
        t1((shard, l.toLong, leaf >> l))
      assert(dd === delta, s"level $l delta")
    }
  }
}

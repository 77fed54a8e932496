package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.hash.Fnv1a32

/** DataSource V2 connector for a deterministic generated keyspace —
  * the engine's exhibit of the full connector surface: TableProvider →
  * Table → ScanBuilder (with filter AND column pushdown) → Batch →
  * PartitionReader.
  *
  * The "storage" is a pure function (key `gen:<i>`, value `v:<i mod
  * 97>`, shard = fnv1a32(key) mod 4 — the engine's own routing hash),
  * which makes the connector oracle-checkable in DuckDB from
  * `range(n)`. What the connector demonstrates is the 100 TB contract
  * every real source must honor:
  *
  *   - **partition planning**: one InputPartition per shard — the unit
  *     of parallelism a cluster schedules;
  *   - **filter pushdown** ([[SupportsPushDownFilters]]): a
  *     `shard_id = k` predicate is consumed by the source and PRUNES
  *     the plan to that shard's single partition — the other three are
  *     never scheduled (the spec counts planned partitions);
  *   - **column pruning** ([[SupportsPushDownRequiredColumns]]): the
  *     reader materializes only requested fields — a `count(key)`
  *     never builds value strings.
  *
  * Usage: `spark.read.format("graft.sources.KvGenSource")
  * .option("rows", n).load()`.
  */
class KvGenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KvGenSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KvGenTable(properties.getOrDefault("rows", "1000").toLong)
}

object KvGenSource {
  val Schema: StructType = new StructType()
    .add("key", StringType, nullable = false)
    .add("value", StringType, nullable = false)
    .add("shard_id", LongType, nullable = false)
  val NumShards = 4

  def shardOf(i: Long): Long = Fnv1a32.hashString(s"gen:$i") % NumShards
}

class KvGenTable(rows: Long) extends Table with SupportsRead {
  override def name(): String = s"kvgen($rows)"
  override def schema(): StructType = KvGenSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KvGenScanBuilder(rows)
}

class KvGenScanBuilder(rows: Long) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var required: StructType = KvGenSource.Schema
  private var shardEq: Option[Long] = None
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (candidates, rejected) = filters.partition {
      case EqualTo("shard_id", _: Long) => true
      case EqualTo("shard_id", _: Int) => true
      case _ => false
    }
    val values = candidates.collect {
      case EqualTo(_, v: Long) => v
      case EqualTo(_, v: Int) => v.toLong
    }.distinct
    // Consume a shard equality only when every pushed EqualTo agrees on one
    // value. Accepting-and-ignoring a second, conflicting equality (e.g.
    // `shard_id = 2 AND shard_id = 3`) would make Spark trust the source to
    // have applied both and return shard-2 rows for a predicate that is
    // unsatisfiable; handing the extras back keeps the post-scan Filter.
    if (values.length == 1) {
      shardEq = Some(values.head)
      pushed = candidates.take(1)
      candidates.drop(1) ++ rejected
    } else {
      shardEq = None
      pushed = Array.empty
      filters // Spark re-evaluates what the source does not consume
    }
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new KvGenScan(rows, shardEq, required)
}

class KvGenScan(rows: Long, shardEq: Option[Long], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"kvgen rows=$rows shard=${shardEq.getOrElse("*")} " +
      s"cols=${required.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    (0 until KvGenSource.NumShards)
      .filter(sh => shardEq.forall(_ == sh.toLong))
      .map(sh => KvGenPartition(rows, sh, required.fieldNames): InputPartition)
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new KvGenReader(p.asInstanceOf[KvGenPartition])
    }
}

case class KvGenPartition(rows: Long, shard: Int, fields: Array[String])
    extends InputPartition

/** Walks the generated id space, emitting only this partition's shard,
  * materializing only the pruned columns. */
class KvGenReader(p: KvGenPartition) extends PartitionReader[InternalRow] {
  private var i = -1L
  override def next(): Boolean = {
    i += 1
    while (i < p.rows && KvGenSource.shardOf(i) != p.shard.toLong) i += 1
    i < p.rows
  }
  override def get(): InternalRow = {
    val values: Array[Any] = p.fields.map {
      case "key" => UTF8String.fromString(s"gen:$i")
      case "value" => UTF8String.fromString(s"v:${i % 97}")
      case "shard_id" => KvGenSource.shardOf(i)
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }
  override def close(): Unit = ()
}

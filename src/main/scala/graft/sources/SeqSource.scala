package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 table: a deterministic synthetic row sequence, the
  * engine's "generator" source for fixtures, load tests, and cost
  * experiments (`spark.read.format("graft.sources.SeqSource")
  * .option("rows", n).option("partitions", p)`).
  *
  * Demonstrates the two scan optimizations a 100 TB source must expose
  * to Catalyst, implemented for real and spec-asserted:
  *
  *  - **column pruning** (`SupportsPushDownRequiredColumns`): readers
  *    compute only the projected columns;
  *  - **filter pushdown** (`SupportsPushDownFilters`): >,>=,<,<= on
  *    `id` narrow the generated range itself — each input partition
  *    clamps its [start, end) slice, so a selective predicate skips
  *    whole partitions exactly like parquet row-group pruning. Pushed
  *    filters are reported as fully handled; everything else stays in
  *    Spark's FilterExec.
  *
  * Row semantics (64-bit-overflow-safe so a SQL oracle replays them):
  * bucket = id % 97, val = ((id*1103515245 + 12345) % 2^31) / 2^31,
  * tag = 't' || id % 5.
  */
class SeqSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SeqTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "8").toInt)
}

object SeqSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("val", DoubleType, nullable = false),
    StructField("tag", StringType, nullable = false)))

  def valOf(id: Long): Double =
    ((id * 1103515245L + 12345L) % 2147483648L).toDouble / 2147483648.0
}

private[sources] class SeqTable(rows: Long, partitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_seq($rows)"
  override def schema(): StructType = SeqSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(rows, partitions)
}

private[sources] class SeqScanBuilder(rows: Long, partitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = SeqSource.schema
  private var lo: Long = 0L          // inclusive
  private var hi: Long = rows        // exclusive
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("id", v: Number)        => lo = math.max(lo, v.longValue + 1); true
      case GreaterThanOrEqual("id", v: Number) => lo = math.max(lo, v.longValue); true
      case LessThan("id", v: Number)           => hi = math.min(hi, v.longValue); true
      case LessThanOrEqual("id", v: Number)    => hi = math.min(hi, v.longValue + 1); true
      case _                                   => false
    }
    pushed = accepted
    rejected // Spark keeps these in a post-scan Filter
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new SeqScan(rows, lo, math.max(lo, hi), partitions, required)
}

private[sources] class SeqScan(rows: Long, lo: Long, hi: Long, partitions: Int,
                               required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"graft_seq range [$lo, $hi)"

  /** Fixed-width partitions over the FULL [0, rows) sequence, each
    * clamped to the pushed [lo, hi) range and dropped when empty — the
    * generator analogue of row-group pruning: a selective id predicate
    * removes whole input partitions from the plan.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    if (hi <= lo) return Array.empty
    val width = math.max(1L, (rows + partitions - 1) / partitions)
    (0L until rows by width)
      .map(s => SeqPartition(math.max(s, lo), math.min(math.min(s + width, rows), hi)))
      .filter(p => p.end > p.start)
      .map(p => p: InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required.fieldNames)
}

private[sources] case class SeqPartition(start: Long, end: Long) extends InputPartition

private[sources] class SeqReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SeqPartition]
    new PartitionReader[InternalRow] {
      private var id = p.start - 1
      override def next(): Boolean = { id += 1; id < p.end }
      override def get(): InternalRow = InternalRow.fromSeq(cols.toSeq.map {
        case "id"     => id
        case "bucket" => (id % 97).toInt
        case "val"    => SeqSource.valOf(id)
        case "tag"    => UTF8String.fromString("t" + (id % 5))
      })
      override def close(): Unit = ()
    }
  }
}

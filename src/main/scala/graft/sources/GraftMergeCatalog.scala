package graft.sources

import java.util

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Minimal DataSource V2 catalog whose tables support Spark's NATIVE
  * row-level MERGE planner (`SupportsRowLevelOperations`) — the
  * API-surface gap a warehouse user hits first: the merge SEMANTICS
  * have been covered relationally since round 2 (upsert_snapshot /
  * upsert_scd2 / cdc_diff, MergeOps), but a real pipeline writes
  * `MERGE INTO target USING source ON ...`, and with Delta/Iceberg
  * jars unavailable offline nothing on the classpath could accept that
  * statement. This catalog closes the gap through the PUBLIC connector
  * API only: a copy-on-write [[RowLevelOperation]] (no `SupportsDelta`,
  * so Catalyst plans the group-based `ReplaceData` rewrite — scan the
  * table, join with the source, re-write surviving rows), which is
  * exactly the plan shape Delta/Iceberg copy-on-write tables produce.
  *
  * Storage is an in-JVM row store (UnsafeRow copies behind a TrieMap):
  * the catalog demonstrates and TESTS the planner path, it is not a
  * lake format — at 100 TB the same `MERGE INTO` text runs unchanged
  * against a real table provider, and everything this module exercises
  * (analysis, the cardinality check, the ReplaceData rewrite, clause
  * projections) is the engine-side half of that stack. Commit is a
  * last-commit-wins atomic swap; rows travel through the standard
  * DataWriter / WriterCommitMessage protocol (UnsafeRow is
  * serializable), so the flow is executor-shaped even though the test
  * harness runs local-mode.
  */
object GraftTableStore {
  /** table name -> committed rows (UnsafeRow copies). */
  private[sources] val rows = new TrieMap[String, Array[InternalRow]]()
  /** table name -> full snapshot per commit (version 0 = first commit)
    * — the copy-on-write history that makes `VERSION AS OF` exact:
    * every commit already materializes the whole table, so time travel
    * is a vector index, the same way a lake format resolves a snapshot
    * id to its manifest list. */
  private[sources] val versions =
    new TrieMap[String, Vector[Array[InternalRow]]]()
  def reset(name: String): Unit = { rows.remove(name); versions.remove(name) }
  def get(name: String): Array[InternalRow] =
    rows.getOrElse(name, Array.empty)
  def getVersion(name: String, v: Int): Array[InternalRow] = {
    val h = versions.getOrElse(name, Vector.empty)
    if (v < 0 || v >= h.size)
      throw new IllegalArgumentException(
        s"version $v of $name does not exist (${h.size} commits)")
    h(v)
  }
  def put(name: String, rs: Array[InternalRow]): Unit = {
    rows.put(name, rs)
    versions.put(name, versions.getOrElse(name, Vector.empty) :+ rs)
  }
}

object GraftMergeCatalog {
  /** JVM-shared table registry keyed by (catalog name, identifier):
    * Spark instantiates one catalog object PER SESSION (including the
    * per-micro-batch session clones foreachBatch runs statements in),
    * so an instance-local map would make tables invisible across
    * sessions — a streaming foreachBatch MERGE into a table created on
    * the outer session is the canonical case (measured; StreamingSpec
    * pins it). */
  private val registry =
    new TrieMap[(String, Identifier), GraftMergeTable]()
}

class GraftMergeCatalog extends TableCatalog {
  import GraftMergeCatalog.registry
  private var catalogName: String = _
  private def key(ident: Identifier) = (catalogName, ident)

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = { catalogName = name }
  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty)
      registry.keys.filter(_._1 == catalogName).map(_._2).toArray
    else throw new NoSuchNamespaceException(namespace)

  override def loadTable(ident: Identifier): Table =
    registry.getOrElse(key(ident), throw new NoSuchTableException(ident))

  // `SELECT ... FROM t VERSION AS OF n` — the analyzer resolves the
  // versioned relation through this overload; a pinned table reads the
  // n-th committed snapshot
  override def loadTable(ident: Identifier, version: String): Table = {
    val t = registry.getOrElse(key(ident),
      throw new NoSuchTableException(ident))
    new GraftMergeTable(t.name(), t.schema(), Some(version.toInt))
  }

  override def createTable(ident: Identifier, info: TableInfo): Table =
    createTable(ident, info.schema(), info.partitions(),
      info.properties())

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (registry.contains(key(ident)))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(
          (ident.namespace() :+ ident.name()).toSeq)
    val t = new GraftMergeTable(s"$catalogName.${ident.name}", schema)
    registry.put(key(ident), t)
    t
  }

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table =
    throw new UnsupportedOperationException("ALTER not supported")

  override def dropTable(ident: Identifier): Boolean =
    registry.remove(key(ident)) match {
      case Some(t) => GraftTableStore.reset(t.name()); true
      case None => false
    }

  override def renameTable(from: Identifier, to: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME not supported")
}

class GraftMergeTable(tableName: String, tableSchema: StructType,
    pinnedVersion: Option[Int] = None)
    extends Table with SupportsRead with SupportsWrite
    with SupportsRowLevelOperations {

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    () => new GraftScan(tableName, tableSchema, pinnedVersion)

  // plain writes (INSERT INTO seeds the table; TRUNCATE for resets)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(tableName, info.schema(), replace = false)

  override def newRowLevelOperationBuilder(info: RowLevelOperationInfo)
      : RowLevelOperationBuilder =
    () => new GraftRowLevelOperation(this, info.command())
}

/** Copy-on-write row-level operation: ONE group = the whole table (no
  * `requiredMetadataAttributes`, no `SupportsDelta`), so Catalyst's
  * group-based rewrite scans everything and the write REPLACES the
  * store — the minimal faithful analogue of a single-file
  * copy-on-write table. */
class GraftRowLevelOperation(table: GraftMergeTable,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {
  override def command(): RowLevelOperation.Command = cmd
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = table.newScanBuilder(options)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(table.name(), info.schema(), replace = true)
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array.empty
  override def description(): String =
    s"GraftCopyOnWrite[${table.name()}]"
}

class GraftScan(tableName: String, tableSchema: StructType,
    pinnedVersion: Option[Int] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = tableSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftScan[$tableName${pinnedVersion.map(v => s"@v$v").getOrElse("")}]"
  override def planInputPartitions(): Array[InputPartition] =
    // committed rows ride INSIDE the partition (UnsafeRow serializes),
    // so the reader works wherever the task lands
    Array(GraftInputPartition(pinnedVersion
      .map(GraftTableStore.getVersion(tableName, _))
      .getOrElse(GraftTableStore.get(tableName))))
  override def createReaderFactory(): PartitionReaderFactory =
    (p: InputPartition) => {
      val rows = p.asInstanceOf[GraftInputPartition].rows
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < rows.length }
        override def get(): InternalRow = rows(i)
        override def close(): Unit = ()
      }
    }
}

case class GraftInputPartition(rows: Array[InternalRow])
    extends InputPartition

/** `replace = false`: append (INSERT INTO). `replace = true`: the
  * ReplaceData commit — surviving + new rows swap the whole store. */
class GraftWriteBuilder(tableName: String, writeSchema: StructType,
    replace: Boolean) extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(info: PhysicalWriteInfo)
          : DataWriterFactory = GraftWriterFactory(writeSchema)
      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        val incoming = messages
          .flatMap(_.asInstanceOf[GraftRowsMessage].rows)
        val base =
          if (replace || doTruncate) Array.empty[InternalRow]
          else GraftTableStore.get(tableName)
        GraftTableStore.put(tableName, base ++ incoming)
      }
      override def abort(messages: Array[WriterCommitMessage]): Unit = ()
    }
  }
}

case class GraftRowsMessage(rows: Array[InternalRow])
    extends WriterCommitMessage

case class GraftWriterFactory(schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] = new DataWriter[InternalRow] {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
    // Incoming rows may be columnar-batch or projection views whose
    // buffers the upstream operator REUSES across rows — materialize
    // each into a fresh on-heap UnsafeRow before buffering (a bare
    // row.copy() on a view row keeps shared string/array references
    // and segfaults once the arena is recycled).
    //
    // Layout quirk (measured on Spark 4.1): for the group-based
    // ReplaceData write, when the connector declares NO metadata
    // columns, ReplaceDataExec.writingTask picks the plain
    // DataWritingSparkTask and the declared rowProjection is never
    // applied — the writer receives the raw MergeRows output
    // [__row_operation, data...] one field WIDER than
    // LogicalWriteInfo.schema() (the projection-applying task only
    // runs when a metadataProjection exists, i.e. for
    // file/position-metadata connectors like the lake formats). Skip
    // the leading operation column in that shape; any other width is
    // a layout this bridge does not know and must FAIL LOUDLY rather
    // than write shifted garbage.
    private var proj: UnsafeProjection = _
    private val buf = scala.collection.mutable.ArrayBuffer[InternalRow]()
    override def write(row: InternalRow): Unit = {
      if (proj == null) {
        proj =
          if (row.numFields == schema.length)
            UnsafeProjection.create(schema)
          else if (row.numFields == schema.length + 1)
            UnsafeProjection.create(schema.fields.zipWithIndex.map {
              case (f, i) =>
                BoundReference(i + 1, f.dataType, f.nullable)
                  : org.apache.spark.sql.catalyst.expressions.Expression
            }.toSeq)
          else throw new IllegalStateException(
            s"row has ${row.numFields} fields, write schema has " +
              s"${schema.length} — unknown row-level write layout")
      }
      buf += proj(row).copy()
    }
    override def commit(): WriterCommitMessage =
      GraftRowsMessage(buf.toArray)
    override def abort(): Unit = buf.clear()
    override def close(): Unit = ()
  }
}

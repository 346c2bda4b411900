package graft.sources

import java.util.concurrent.ConcurrentHashMap
import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, NamespaceAlreadyExistsException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.{UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{AlwaysTrue, Filter}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** In-memory catalog plugin — the Spark-native analog of the
  * reference's `GenericInMemoryCatalog`
  * (flink-table/flink-table-api-java/.../GenericInMemoryCatalog.java:64:
  * a `Catalog` holding databases/tables/partitions/functions in JVM
  * maps, registered via `CREATE CATALOG c WITH ('type' =
  * 'generic_in_memory')`). Re-expressed on Spark's DataSourceV2
  * catalog API instead of a bespoke catalog interface:
  *
  *   - `TableCatalog` + `SupportsNamespaces`, registered under
  *     `spark.sql.catalog.<name>`, so every native statement —
  *     `CREATE/DROP NAMESPACE`, `CREATE TABLE c.db.t`, `INSERT INTO`,
  *     `SELECT`, `ALTER TABLE … SET TBLPROPERTIES`, `SHOW TABLES IN c`
  *     — plans through Catalyst's resolved v2 plans with no custom
  *     statement handling at all.
  *   - Tables are full read/write DSv2 tables: reads ship row chunks
  *     inside `InputPartition`s (executor-parallel, no driver
  *     side-channel at scan time) and report row-count/size statistics
  *     to the planner, so a small in-memory dimension auto-broadcasts
  *     exactly like a stats-fed filesystem table; writes buffer
  *     per-task and deliver rows through `WriterCommitMessage`s, i.e.
  *     the two-phase v2 commit protocol — INSERT INTO appends,
  *     INSERT OVERWRITE arrives as overwrite-by-AlwaysTrue and
  *     truncates, exactly-once per Spark's commit coordinator.
  *
  * Like the reference's generic_in_memory catalog this is a
  * dev/metadata surface, NOT a 100 TB data path: all rows live on the
  * JVM heap of the driver (the store) and are re-shipped per scan.
  * The scale path remains the filesystem/parquet tables; this catalog
  * exists so catalog-qualified DDL/DML round-trips the way reference
  * users script it.
  */
class GraftInMemoryCatalog extends TableCatalog with SupportsNamespaces {
  import GraftInMemoryCatalog._

  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val s = stores.computeIfAbsent(name, _ => new Store)
    // the reference's catalog is created with a default database
    // ("default-database" option, GenericInMemoryCatalog ctor)
    s.synchronized {
      if (!s.namespaces.contains(Seq("default")))
        s.namespaces.put(Seq("default"), Map.empty)
    }
  }

  override def name(): String = catalogName

  private def store: Store =
    Option(stores.get(catalogName)).getOrElse(sys.error(
      s"in-memory catalog '$catalogName' has no store (dropped?)"))

  // ---- namespaces -------------------------------------------------

  override def listNamespaces(): Array[Array[String]] =
    store.namespaces.keySet.toArray.sortBy(_.mkString(".")).map(_.toArray)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) listNamespaces()
    else if (store.namespaces.contains(namespace.toSeq)) Array.empty
    else throw new NoSuchNamespaceException(namespace)
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    store.namespaces.contains(namespace.toSeq)

  override def loadNamespaceMetadata(namespace: Array[String]): java.util.Map[String, String] =
    store.namespaces.get(namespace.toSeq) match {
      case Some(meta) => meta.asJava
      case None => throw new NoSuchNamespaceException(namespace)
    }

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = store.synchronized {
    if (store.namespaces.contains(namespace.toSeq))
      throw new NamespaceAlreadyExistsException(namespace)
    store.namespaces.put(namespace.toSeq, metadata.asScala.toMap)
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit = store.synchronized {
    val meta = store.namespaces.getOrElse(namespace.toSeq,
      throw new NoSuchNamespaceException(namespace))
    val updated = changes.foldLeft(meta) {
      case (m, set: NamespaceChange.SetProperty) => m + (set.property -> set.value)
      case (m, rm: NamespaceChange.RemoveProperty) => m - rm.property
      case (_, other) => sys.error(s"unsupported namespace change: $other")
    }
    store.namespaces.put(namespace.toSeq, updated)
  }

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = store.synchronized {
    if (!store.namespaces.contains(namespace.toSeq)) return false
    val inNs = store.tables.keys.filter(_._1 == namespace.toSeq).toSeq
    if (inNs.nonEmpty && !cascade)
      throw new org.apache.spark.sql.catalyst.analysis.NonEmptyNamespaceException(
        namespace)
    inNs.foreach(store.tables.remove)
    store.namespaces.remove(namespace.toSeq)
    true
  }

  // ---- tables -----------------------------------------------------

  private def key(ident: Identifier) = (ident.namespace.toSeq, ident.name)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!store.namespaces.contains(namespace.toSeq))
      throw new NoSuchNamespaceException(namespace)
    store.tables.keys.filter(_._1 == namespace.toSeq)
      .map { case (ns, n) => Identifier.of(ns.toArray, n) }
      .toArray.sortBy(_.name)
  }

  override def loadTable(ident: Identifier): Table =
    store.tables.get(key(ident)) match {
      case Some(state) => new MemTable(fullName(ident), state)
      case None => throw new NoSuchTableException(ident)
    }

  private def fullName(ident: Identifier): String =
    (catalogName +: ident.namespace.toSeq :+ ident.name).mkString(".")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = store.synchronized {
    if (store.tables.contains(key(ident)))
      throw new TableAlreadyExistsException(ident)
    if (!store.namespaces.contains(ident.namespace.toSeq))
      throw new NoSuchNamespaceException(ident.namespace)
    // partition transforms are metadata here, like the reference's
    // CatalogPartitionSpec map — identity only, anything else loud
    val partCols = partitions.map {
      case t if t.name == "identity" && t.references.length == 1 =>
        t.references.head.fieldNames.mkString(".")
      case other => sys.error(
        s"in-memory catalog supports identity partitioning only, got $other")
    }
    val state = new TableState(schema, partCols.toSeq,
      properties.asScala.toMap)
    store.tables.put(key(ident), state)
    new MemTable(fullName(ident), state)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = store.synchronized {
    val state = store.tables.getOrElse(key(ident),
      throw new NoSuchTableException(ident))
    changes.foreach {
      case set: TableChange.SetProperty =>
        state.properties += (set.property -> set.value)
      case rm: TableChange.RemoveProperty =>
        state.properties -= rm.property
      case add: TableChange.AddColumn =>
        // appending a column would need an in-place rewrite of every
        // buffered UnsafeRow — allowed only while the table is empty
        require(state.rows.isEmpty,
          s"ALTER TABLE ADD COLUMN on non-empty in-memory table ${ident.name}")
        require(add.fieldNames.length == 1,
          "nested ADD COLUMN unsupported in in-memory catalog")
        state.schema = state.schema.add(add.fieldNames.head, add.dataType,
          add.isNullable)
      case other => sys.error(s"unsupported table change: $other")
    }
    new MemTable(fullName(ident), state)
  }

  override def dropTable(ident: Identifier): Boolean =
    store.synchronized { store.tables.remove(key(ident)).isDefined }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    store.synchronized {
      val state = store.tables.remove(key(oldIdent)).getOrElse(
        throw new NoSuchTableException(oldIdent))
      if (store.tables.contains(key(newIdent)))
        throw new TableAlreadyExistsException(newIdent)
      store.tables.put(key(newIdent), state)
    }
}

object GraftInMemoryCatalog {
  /** One store per catalog NAME — shared across sessions in the JVM,
    * like the reference's per-name catalog instances held by the
    * CatalogManager. */
  private val stores = new ConcurrentHashMap[String, Store]

  private[sources] final class Store {
    val namespaces = mutable.Map[Seq[String], Map[String, String]]()
    val tables = mutable.Map[(Seq[String], String), TableState]()
  }

  private[sources] final class TableState(
      @volatile var schema: StructType,
      val partitionCols: Seq[String],
      @volatile var properties: Map[String, String]) {
    /** Committed rows, driver-held (UnsafeRow copies bound to schema). */
    val rows = mutable.ArrayBuffer[UnsafeRow]()
    def append(batch: Seq[UnsafeRow], truncateFirst: Boolean): Unit =
      synchronized {
        if (truncateFirst) rows.clear()
        rows ++= batch
      }
    def snapshot(): Array[UnsafeRow] = synchronized { rows.toArray }
  }

  /** Dropping a catalog discards its store (DROP CATALOG path). */
  private[sources] def dropStore(name: String): Boolean =
    stores.remove(name) != null

  /** CREATE CATALOG path: (re-)create the store even when Spark's
    * CatalogManager still holds a cached plugin instance from a
    * previous CREATE/DROP cycle — `initialize` won't re-run on the
    * cached instance, so the store must be re-seeded here or the
    * re-created catalog would be permanently dead. */
  private[sources] def ensureStore(name: String): Unit = {
    val s = stores.computeIfAbsent(name, _ => new Store)
    s.synchronized {
      if (!s.namespaces.contains(Seq("default")))
        s.namespaces.put(Seq("default"), Map.empty)
    }
  }

  private[sources] def tableCount(name: String): Int =
    Option(stores.get(name)).map(_.tables.size).getOrElse(0)

  // ---- table ------------------------------------------------------

  private final class MemTable(tableName: String, state: TableState)
      extends Table with SupportsRead with SupportsWrite {
    override def name(): String = tableName
    override def schema(): StructType = state.schema
    override def partitioning(): Array[Transform] =
      state.partitionCols.map(c =>
        org.apache.spark.sql.connector.expressions.Expressions.identity(c)).toArray
    override def properties(): java.util.Map[String, String] =
      state.properties.asJava
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
        TableCapability.OVERWRITE_BY_FILTER)

    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      () => new MemScan(state)

    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
      new MemWriteBuilder(state, info.schema())
  }

  // ---- read path --------------------------------------------------

  private final class MemScan(state: TableState)
      extends Scan with Batch with SupportsReportStatistics {
    private val snap = state.snapshot()
    override def readSchema(): StructType = state.schema
    override def toBatch: Batch = this
    override def estimateStatistics(): Statistics = new Statistics {
      private val rowBytes = math.max(8L, state.schema.defaultSize.toLong)
      override def sizeInBytes() =
        java.util.OptionalLong.of(snap.length * rowBytes)
      override def numRows() = java.util.OptionalLong.of(snap.length)
    }
    override def planInputPartitions(): Array[InputPartition] = {
      if (snap.isEmpty) return Array.empty
      // chunk the snapshot so a larger dev table still scans in
      // parallel; each partition carries its own rows (self-contained,
      // executor-shippable — no driver callback at read time)
      val slices = math.min(snap.length, 8)
      val per = (snap.length + slices - 1) / slices
      snap.grouped(per).map(ch => MemPartition(ch): InputPartition).toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new MemReaderFactory
  }

  private final case class MemPartition(rows: Array[UnsafeRow])
      extends InputPartition

  private final class MemReaderFactory extends PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] =
      new PartitionReader[InternalRow] {
        private val rows = p.asInstanceOf[MemPartition].rows
        private var i = -1
        override def next(): Boolean = { i += 1; i < rows.length }
        override def get(): InternalRow = rows(i)
        override def close(): Unit = ()
      }
  }

  // ---- write path -------------------------------------------------

  private final class MemWriteBuilder(state: TableState, writeSchema: StructType)
      extends WriteBuilder with SupportsOverwrite {
    private var truncateFirst = false
    override def truncate(): WriteBuilder = { truncateFirst = true; this }
    override def overwrite(filters: Array[Filter]): WriteBuilder = {
      // only the full-table overwrite (INSERT OVERWRITE) is meaningful
      // for a heap store; partial overwrite-by-filter is loud
      require(filters.forall(_ == AlwaysTrue),
        s"in-memory catalog supports full-table overwrite only, got ${filters.mkString(",")}")
      truncate()
    }
    override def build(): Write = new Write {
      override def toBatch: BatchWrite = new MemBatchWrite(state, writeSchema,
        truncateFirst)
    }
  }

  private final case class MemCommit(rows: Array[UnsafeRow])
      extends WriterCommitMessage

  private final class MemBatchWrite(state: TableState, writeSchema: StructType,
      truncateFirst: Boolean) extends BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      new MemWriterFactory(writeSchema)
    override def commit(messages: Array[WriterCommitMessage]): Unit =
      state.append(
        messages.iterator.flatMap(_.asInstanceOf[MemCommit].rows).toSeq,
        truncateFirst)
    override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  }

  private final class MemWriterFactory(writeSchema: StructType)
      extends DataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
      new DataWriter[InternalRow] {
        private val proj = UnsafeProjection.create(writeSchema)
        private val buf = mutable.ArrayBuffer[UnsafeRow]()
        override def write(row: InternalRow): Unit =
          buf += proj(row).copy()
        override def commit(): WriterCommitMessage = MemCommit(buf.toArray)
        override def abort(): Unit = buf.clear()
        override def close(): Unit = ()
      }
  }
}

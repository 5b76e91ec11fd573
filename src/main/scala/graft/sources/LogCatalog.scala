package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 CATALOG for entity logs — the final integration tier:
  * the same `limits_hashes` log tables the TableProvider exposes by
  * path become SQL-addressable objects under a configured warehouse:
  *
  * {{{
  *   spark.sql.catalog.graft           = graft.sources.LogCatalog
  *   spark.sql.catalog.graft.warehouse = /data/logs
  *
  *   CREATE TABLE graft.ingest.limits (user_id STRING, amount BIGINT,
  *                                     msg BINARY, sha256sum STRING);
  *   INSERT INTO graft.ingest.limits SELECT ...;   -- staged-commit write
  *   SELECT user_id, amount FROM graft.ingest.limits WHERE user_id = 'u7';
  * }}}
  *
  * Identifier `ns.table` maps to `<warehouse>/ns/table/`.
  *
  * TWO table formats live under one namespace, dispatched on the
  * DECLARED SCHEMA — the DSv2 analogue of the reference's
  * migrations-owned layout (`migrate.go:13-34`, where the migration
  * decides each table's engine):
  *
  *   - the fixed entity schema (or none) → a [[LimitHashLogTable]],
  *     with the log connector's pruning / pushdown / staged-commit /
  *     stats machinery;
  *   - any other schema → a catalog-managed PARQUET table: the schema
  *     persists as `_schema.json` in the table directory (so an empty
  *     table is readable and the layout survives restarts) and reads /
  *     writes go through Spark's own vectorized parquet `FileTable` —
  *     full predicate pushdown, column pruning, and columnar batches
  *     through the same `graft.<ns>.<t>` identifiers. */
class LogCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: String = _
  private def fs = new Path(warehouse).getFileSystem(new Configuration())

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName

  private def dirOf(ident: Identifier): Path =
    ident.namespace().foldLeft(new Path(warehouse))(new Path(_, _)) match {
      case nsDir => new Path(nsDir, ident.name())
    }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val nsDir = namespace.foldLeft(new Path(warehouse))(new Path(_, _))
    if (!fs.exists(nsDir)) return Array.empty
    fs.listStatus(nsDir).filter(_.isDirectory)
      .map(s => Identifier.of(namespace, s.getPath.getName))
  }

  /** Schema manifest of a catalog-managed parquet table; its absence
    * marks an entity-log directory. The parquet FILES live in the
    * `data/` subdirectory — INSERT OVERWRITE truncates the data path,
    * and keeping the manifest a level above means a truncate can never
    * destroy the table's layout. */
  private def schemaFile(dir: Path): Path = new Path(dir, "_schema.json")
  private def dataDir(dir: Path): Path = new Path(dir, "data")

  private def parquetTable(ident: Identifier, dir: Path, schema: StructType): Table =
    // a genuine ParquetTable (FileTable write/analyzer paths intact)
    // with footer-stats file skipping on reads (ParquetStats.scala)
    new StatsPrunedParquetTable(
      ident.toString,
      org.apache.spark.sql.classic.SparkSession.active,
      Seq(dataDir(dir).toString),
      schema)

  override def loadTable(ident: Identifier): Table = {
    val dir = dirOf(ident)
    if (!fs.exists(dir)) {
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    }
    val sf = schemaFile(dir)
    if (fs.exists(sf)) {
      val in = fs.open(sf)
      val json = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      // finish any interrupted compactTable generation swap first —
      // a crash between renames must never surface as a missing table
      Compaction.repairGenerations(fs, dir)
      parquetTable(ident, dir,
        org.apache.spark.sql.types.DataType.fromJson(json).asInstanceOf[StructType])
    } else new LimitHashLogTable(dir.toString)
  }

  /** Entity-shaped (or empty) schema → entity log; anything else → a
    * schema-manifested parquet table. The entity's layout stays owned
    * by the engine either way — a log table's columns can't drift. */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String]): Table = {
    require(partitions.isEmpty, "graft catalog tables are unpartitioned")
    val dir = dirOf(ident)
    if (fs.exists(dir)) {
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        ident.toString)
    }
    val want = LimitHashLog.SCHEMA.fields.map(f => (f.name, f.dataType)).toSeq
    val got = schema.fields.map(f => (f.name, f.dataType)).toSeq
    if (schema.isEmpty || got == want) {
      fs.mkdirs(dir)
      new LimitHashLogTable(dir.toString)
    } else {
      fs.mkdirs(dataDir(dir))
      val out = fs.create(schemaFile(dir), false)
      try out.write(schema.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      parquetTable(ident, dir, schema)
    }
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("entity log tables are immutable in layout")

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    fs.exists(dir) && fs.delete(dir, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val to = dirOf(newIdent)
    fs.mkdirs(to.getParent)
    if (!fs.rename(dirOf(oldIdent), to)) {
      throw new IllegalStateException(s"rename $oldIdent -> $newIdent failed")
    }
  }

  // --- namespaces: directories under the warehouse ---

  override def listNamespaces(): Array[Array[String]] = {
    val root = new Path(warehouse)
    if (!fs.exists(root)) return Array.empty
    fs.listStatus(root).filter(_.isDirectory).map(s => Array(s.getPath.getName))
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces() else Array.empty

  override def loadNamespaceMetadata(namespace: Array[String]): java.util.Map[String, String] = {
    val dir = namespace.foldLeft(new Path(warehouse))(new Path(_, _))
    if (!fs.exists(dir)) {
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(namespace)
    }
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    fs.mkdirs(namespace.foldLeft(new Path(warehouse))(new Path(_, _)))
  }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("namespace metadata is not stored")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val dir = namespace.foldLeft(new Path(warehouse))(new Path(_, _))
    if (!fs.exists(dir)) return false
    if (!cascade && fs.listStatus(dir).nonEmpty) {
      throw new IllegalStateException(s"namespace ${namespace.mkString(".")} is not empty")
    }
    fs.delete(dir, true)
  }
}

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
  * Identifier `ns.table` maps to `<warehouse>/ns/table/`; every
  * resolved table is a [[LimitHashLogTable]], so the catalog path gets
  * the exact same pruning / pushdown / staged-commit machinery as the
  * path-based API. Table schema is FIXED by the entity (SURVEY §1.1) —
  * `createTable` validates rather than persists the requested columns,
  * which is the ClickHouse-style "the engine owns the table layout"
  * contract the reference's migrations encode (`migrate.go:13`). */
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

  override def loadTable(ident: Identifier): Table = {
    val dir = dirOf(ident)
    if (!fs.exists(dir)) {
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    }
    new LimitHashLogTable(dir.toString)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String]): Table = {
    require(partitions.isEmpty, "entity log tables are unpartitioned")
    // the entity owns its layout: accept an empty schema (CTAS-less
    // `CREATE TABLE t` is not valid SQL, so in practice callers state
    // it) or exactly the entity schema, by name and type
    if (schema.nonEmpty) {
      val want = LimitHashLog.SCHEMA.fields.map(f => (f.name, f.dataType)).toSeq
      val got = schema.fields.map(f => (f.name, f.dataType)).toSeq
      require(got == want,
        s"entity log schema is fixed: ${LimitHashLog.SCHEMA.simpleString}, got ${schema.simpleString}")
    }
    val dir = dirOf(ident)
    if (fs.exists(dir)) {
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        ident.toString)
    }
    fs.mkdirs(dir)
    new LimitHashLogTable(dir.toString)
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

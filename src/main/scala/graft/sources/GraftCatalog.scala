package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Multi-catalog federation (SURVEY §2.1: Doris 2.x external catalogs,
  * [doris: fe/.../datasource/] — `CREATE CATALOG hive_prod PROPERTIES(...)`
  * then `SELECT … FROM hive_prod.db.t`). Spark's native equivalent is the
  * DataSource V2 `CatalogPlugin` API — the same extension point Iceberg,
  * Delta and the Hive connector plug into — so the capability under test is
  * the CONNECTOR SURFACE: three-part identifiers, per-catalog options,
  * lazy instantiation from session conf, cross-catalog joins, and full
  * pushdown through a federated table (asserted in CatalogSpec).
  *
  * This catalog federates a directory of parquet files as read-only tables
  * under a single `main` namespace — `{root}/{table}.parquet` —
  * delegating table mechanics to Spark's own ParquetTable (v2 FileTable),
  * which brings vectorized read, filter pushdown, and column pruning for
  * free. Registration is pure session conf, no services:
  *   spark.conf.set("spark.sql.catalog.<name>", classOf[GraftCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.<name>.root", dir)
  *   spark.sql("SELECT … FROM <name>.main.lineitem")
  * Writes are rejected — federated external catalogs are a read surface
  * here, exactly the slice of Doris multi-catalog a query engine needs.
  * (Hive/Iceberg/ES service-backed catalogs remain env-excluded; this is
  * the in-env demonstration of the same Spark API they use.)
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires option spark.sql.catalog.$name.root"))
  }

  override def name(): String = catalogName

  private val NS = Array("main")

  private def tablePath(t: String) = {
    // identifier hygiene: a backtick-quoted name like `../../x` would
    // otherwise resolve parquet OUTSIDE the configured root (ADVICE r10) —
    // reject separators/.. up front and double-check the canonical path
    // still lands under root (canonical also neutralizes symlink tricks)
    if (t.contains("/") || t.contains("\\") || t.contains(".."))
      throw new NoSuchTableException(Identifier.of(NS, t))
    val f = new java.io.File(root, s"$t.parquet")
    if (!f.getCanonicalPath.startsWith(new java.io.File(root).getCanonicalPath
        + java.io.File.separator))
      throw new NoSuchTableException(Identifier.of(NS, t))
    f
  }

  override def listNamespaces(): Array[Array[String]] = Array(NS)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) Array(NS)
    else if (namespace.sameElements(NS)) Array.empty
    else throw new NoSuchNamespaceException(catalogName +: namespace)

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespace.sameElements(NS)) util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(catalogName +: namespace)

  override def createNamespace(ns: Array[String], meta: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(s"$catalogName is read-only")

  override def alterNamespace(ns: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(s"$catalogName is read-only")

  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException(s"$catalogName is read-only")

  override def listTables(namespace: Array[String]): Array[Identifier] =
    if (!namespace.sameElements(NS))
      throw new NoSuchNamespaceException(catalogName +: namespace)
    else
      Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.endsWith(".parquet"))
        .map(f => Identifier.of(NS, f.getName.stripSuffix(".parquet")))
        .sortBy(_.name)

  override def loadTable(ident: Identifier): Table = {
    val f = tablePath(ident.name)
    if (!ident.namespace.sameElements(NS) || !f.exists())
      throw new NoSuchTableException(ident)
    // Spark's own v2 parquet table: vectorized scan + pushdown + pruning.
    // Wrapped read-only: FileTable advertises BATCH_WRITE, so returning it
    // bare would let `INSERT INTO <cat>.main.t` plan an AppendData that
    // never consults this catalog's throwing createTable/alterTable — the
    // wrapper strips the write capabilities so writes fail at ANALYSIS
    // with a clear unsupported-operation error, not by I/O accident.
    new GraftCatalog.ReadOnlyTable(ParquetTable(ident.name, SparkSession.active,
      CaseInsensitiveStringMap.empty(), Seq(f.getAbsolutePath),
      None, classOf[ParquetFileFormat]))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(s"$catalogName is read-only")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(s"$catalogName is read-only")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(s"$catalogName is read-only")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(s"$catalogName is read-only")
}

object GraftCatalog {
  /** Register (idempotently) a GraftCatalog over `dir` on this session and
    * return its catalog name. Pure session conf — the catalog instantiates
    * lazily on first three-part-identifier reference. */
  def register(s: SparkSession, dir: String): String = {
    val cat = "graft_cat_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", dir)
    cat
  }

  /** Read-capability-only view over a delegate table: every write
    * capability is stripped, so DML against the federated catalog is
    * rejected by the analyzer regardless of what the delegate supports. */
  private[sources] class ReadOnlyTable(delegate: Table)
      extends Table with SupportsRead {
    override def name(): String = delegate.name()
    override def schema(): StructType = delegate.schema()
    override def partitioning(): Array[Transform] = delegate.partitioning()
    override def properties(): util.Map[String, String] = delegate.properties()
    override def capabilities(): util.Set[TableCapability] = {
      val caps = new util.HashSet[TableCapability](delegate.capabilities())
      caps.remove(TableCapability.BATCH_WRITE)
      caps.remove(TableCapability.V1_BATCH_WRITE)
      caps.remove(TableCapability.STREAMING_WRITE)
      caps.remove(TableCapability.OVERWRITE_BY_FILTER)
      caps.remove(TableCapability.OVERWRITE_DYNAMIC)
      caps.remove(TableCapability.TRUNCATE)
      caps
    }
    override def newScanBuilder(options: CaseInsensitiveStringMap) =
      delegate.asInstanceOf[SupportsRead].newScanBuilder(options)
  }
}

package org.apache.spark.sql.graft.sources

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._
import scala.util.Try

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.connector.expressions.{FieldReference, Literal => V2Literal, LiteralValue, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsReportStatistics, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitioningAwareFileIndex}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.FileDataSourceV2
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetScanBuilder, ParquetTable}
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * `graft-parquet`: the built-in v2 parquet source plus
 * [[SupportsRuntimeV2Filtering]] — the missing piece that lets RUNTIME
 * join-key values reach the scan itself. Stock Spark file sources only
 * runtime-prune PARTITION directories (DPP); the reference pushes its
 * dynamic filters all the way into the table scan
 * (rpt_optimizer.cpp:1401-1501, physical_create_bf.cpp:282-350 — the
 * created filter is handed to LOGICAL_GET and evaluated during the
 * scan). This source is the Spark-native analog: when the engine plans a
 * runtime group filter (stock DPP, or the RPT rule's spliced
 * [[org.apache.spark.sql.catalyst.expressions.DynamicPruningSubquery]]),
 * `filter(predicates)` receives the build side's key values and
 *  - drops whole FILES whose footer min/max excludes every value
 *    (driver-side, bounded, cached — at 100 TB with ~128 MB files and a
 *    key-clustered layout this skips scheduling entire task sets);
 *  - appends the values to the pushed parquet filters, so surviving
 *    files skip ROW GROUPS via zone maps / dictionaries inside the
 *    reader (executor-side, no driver cost).
 * Everything else — schema inference, vectorized reading, aggregate
 * pushdown, writes — is the stock parquet v2 path, delegated verbatim.
 *
 * Lives under `org.apache.spark.sql` because the file-source v2 scaffold
 * (`FileDataSourceV2`, `ParquetTable`, `ParquetScanBuilder`) is
 * `private[sql]` — same bridge precedent as
 * [[org.apache.spark.sql.graft.SqlBridge]].
 */
class GraftParquetDataSource extends FileDataSourceV2 {

  override def fallbackFileFormat: Class[_ <: org.apache.spark.sql.execution.datasources.FileFormat] =
    classOf[ParquetFileFormat]

  override def shortName(): String = "graft-parquet"

  override def getTable(options: CaseInsensitiveStringMap): org.apache.spark.sql.connector.catalog.Table = {
    val paths = getPaths(options)
    val tableName = getTableName(options, paths)
    val optionsWithoutPaths = getOptionsWithoutPaths(options)
    new GraftParquetTable(tableName, sparkSession, optionsWithoutPaths, paths, None)
  }

  override def getTable(options: CaseInsensitiveStringMap, schema: StructType): org.apache.spark.sql.connector.catalog.Table = {
    val paths = getPaths(options)
    val tableName = getTableName(options, paths)
    val optionsWithoutPaths = getOptionsWithoutPaths(options)
    new GraftParquetTable(tableName, sparkSession, optionsWithoutPaths, paths, Some(schema))
  }
}

/** Stock [[ParquetTable]] whose scans are runtime-filterable. */
class GraftParquetTable(
    tableName: String,
    spark: SparkSession,
    tableOptions: CaseInsensitiveStringMap,
    tablePaths: Seq[String],
    declaredSchema: Option[StructType])
  extends ParquetTable(tableName, spark, tableOptions, tablePaths,
    declaredSchema, classOf[ParquetFileFormat]) {

  override def newScanBuilder(options: CaseInsensitiveStringMap): ParquetScanBuilder =
    new GraftParquetScanBuilder(spark, fileIndex, schema, dataSchema, options)
}

class GraftParquetScanBuilder(
    spark: SparkSession,
    index: PartitioningAwareFileIndex,
    tableSchema: StructType,
    parquetDataSchema: StructType,
    opts: CaseInsensitiveStringMap)
  extends ParquetScanBuilder(spark, index, tableSchema, parquetDataSchema, opts) {

  override def build(): ParquetScan = new GraftParquetScan(super.build())
}

/**
 * A [[ParquetScan]] that also implements [[SupportsRuntimeV2Filtering]].
 * The v2 contract calls `filter` at most once per scan instance, before
 * partition planning; a second call with different predicates (a shared
 * instance across plan branches) conservatively DISABLES pruning rather
 * than over-prune either consumer — runtime filters only ever skip data
 * that cannot match, so "no pruning" is always correct.
 */
class GraftParquetScan(base: ParquetScan)
  extends ParquetScan(base.sparkSession, base.hadoopConf, base.fileIndex,
    base.dataSchema, base.readDataSchema, base.readPartitionSchema,
    base.pushedFilters, base.options, base.pushedAggregate,
    base.partitionFilters, base.dataFilters, base.pushedVariantExtractions)
  with SupportsRuntimeV2Filtering {

  // (column name -> runtime key values, Catalyst-internal representation)
  @volatile private var runtimeKeys: Map[String, Array[Any]] = Map.empty
  @volatile private var poisoned = false
  // visible for tests/metrics: files before/after the footer prune
  @volatile var lastFilePrune: Option[(Int, Int)] = None
  // visible for tests: predicates received / parsed by the last filter()
  @volatile var lastFilterCall: Option[(Int, Int)] = None

  private def atomic(dt: DataType): Boolean = dt match {
    case _: IntegerType | _: LongType | _: ShortType | _: ByteType |
         _: StringType | _: DateType | _: FloatType | _: DoubleType => true
    case _ => false
  }

  override def filterAttributes(): Array[NamedReference] =
    readDataSchema.fields.collect {
      case f if atomic(f.dataType) => FieldReference.column(f.name)
    }

  override def filter(predicates: Array[V2Predicate]): Unit = {
    GraftParquetScan.filterCalls.incrementAndGet()
    val parsed = predicates.flatMap(parseEqualityPredicate)
    lastFilterCall = Some((predicates.length, parsed.length))
    if (parsed.isEmpty) return
    // the predicates array is a CONJUNCTION: several IN-sets on one column
    // (e.g. forward and backward transfer passes) intersect — an empty
    // intersection legitimately prunes the whole scan
    val next = parsed.groupBy(_._1).map { case (c, vs) =>
      c -> vs.map(_._2.toSet).reduce(_ intersect _).toArray
    }
    synchronized {
      if (runtimeKeys.nonEmpty && runtimeKeys != next) poisoned = true
      else runtimeKeys = next
    }
  }

  /** `IN(col, v...)` / `col = v` with literal values — the shapes the
    * engine produces from a planned runtime group filter. */
  private def parseEqualityPredicate(p: V2Predicate): Option[(String, Array[Any])] = {
    val col = p.children().headOption match {
      case Some(r: NamedReference) if r.fieldNames.length == 1 =>
        Some(r.fieldNames.head)
      case _ => None
    }
    col.filter(c => readDataSchema.fieldNames.contains(c)).flatMap { c =>
      p.name() match {
        case "IN" | "=" =>
          val vals = p.children().drop(1).map {
            case l: V2Literal[_] => Some(l.value.asInstanceOf[Any])
            case _ => None
          }
          // Drop null literals (a nullable build-side join key can emit
          // them): null never equi-matches, so removing them is exact —
          // and the comparators in fileMayContain / runtimeFilteredCopy
          // are null-hostile. An all-null build set legitimately becomes
          // the empty set, which prunes every file.
          if (vals.nonEmpty && vals.forall(_.isDefined))
            Some(c -> vals.flatten.filterNot(_ == null)) else None
        case _ => None
      }
    }
  }

  /** A stock copy with the runtime values appended to the pushed parquet
    * filters — surviving files skip row groups via zone maps /
    * dictionaries inside the reader. Pushed filter values use external
    * Scala types (String, not UTF8String). */
  private def runtimeFilteredCopy: ParquetScan = {
    val keys = runtimeKeys
    if (keys.isEmpty || poisoned) return this
    val extra = keys.flatMap { case (c, vals) =>
      val dt = readDataSchema(c).dataType
      val conv = CatalystTypeConverters.createToScalaConverter(dt)
      val ext = vals.map(conv)
      // IN for exactness (dictionary + small-set zone-map skip; parquet
      // refuses over-threshold INs) plus the [min,max] range, which
      // parquet can always evaluate cheaply. An EMPTY value set pushes
      // nothing — the file-level prune already drops every file.
      (if (ext.isEmpty) Seq.empty
       else Seq[sources.Filter](sources.In(c, ext))) ++
        (GraftParquetScan.catalystOrdering(dt) match {
          case Some(ord) if vals.nonEmpty => Seq(
            sources.GreaterThanOrEqual(c, conv(vals.min(ord))),
            sources.LessThanOrEqual(c, conv(vals.max(ord))))
          case _ => Seq.empty
        })
    }.toArray
    copy(pushedFilters = pushedFilters ++ extra)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    if (runtimeKeys.isEmpty || poisoned) super.createReaderFactory()
    else runtimeFilteredCopy.createReaderFactory()

  /** File-level prune: drop files whose footer [min,max] on a filtered
    * column excludes every RUNTIME value — and, independently, files whose
    * footer range falsifies a STATIC pushed filter (the stock reader only
    * uses pushed filters for row-group skipping inside already-scheduled
    * tasks; at 100 TB, deciding at the driver that a file cannot match
    * skips scheduling the task at all). The static path is what makes the
    * rule's range-summary fallback (over-cap builds pushing literal
    * OR-of-ranges instead of the key set) prune files like the key set
    * would have. */
  override protected def partitions: Seq[FilePartition] = {
    val base = super.partitions
    val keys = runtimeKeys
    val runtimeOk = keys.nonEmpty && !poisoned
    val staticFilters = pushedFilters.filter(GraftParquetScan.prunable)
    if (!runtimeOk && staticFilters.isEmpty) return base
    val kept = base.flatMap { fp =>
      val files = fp.files.filter { f =>
        (!runtimeOk || keys.forall { case (c, vals) =>
          GraftParquetScan.fileMayContain(
            hadoopConf, f.filePath.toPath, f.fileSize, c,
            readDataSchema(c).dataType, vals)
        }) &&
        staticFilters.forall(flt => GraftParquetScan.fileMayMatch(
          hadoopConf, f.filePath.toPath, f.fileSize, readDataSchema, flt))
      }
      if (files.isEmpty) None else Some(files)
    }
    lastFilePrune = Some((base.map(_.files.length).sum, kept.map(_.length).sum))
    GraftParquetScan.lastFilePruneGlobal = lastFilePrune
    GraftParquetScan.lastBytePruneGlobal = Some((
      base.map(_.files.map(_.fileSize).sum).sum,
      kept.map(_.map(_.fileSize).sum).sum))
    kept.zipWithIndex.map { case (fs, i) => FilePartition(i, fs) }
  }

  override def description(): String = {
    val rf =
      if (poisoned) ", RuntimeFilters: [disabled: conflicting reuse]"
      else if (runtimeKeys.isEmpty) ""
      else runtimeKeys.map { case (c, v) => s"$c IN (${v.length} values)" }
        .mkString(", RuntimeFilters: [", ", ", "]")
    super.description() + rf
  }

  // scan-reuse equality: stock field equality AND same runtime state (a
  // runtime-filtered scan is not interchangeable with an unfiltered one)
  override def equals(obj: Any): Boolean = obj match {
    case g: GraftParquetScan =>
      super.equals(g) && runtimeKeysEq(g) && poisoned == g.poisoned
    case _ => false
  }
  private def runtimeKeysEq(g: GraftParquetScan): Boolean =
    runtimeKeys.keySet == g.runtimeKeys.keySet &&
      runtimeKeys.forall { case (c, v) => g.runtimeKeys(c).sameElements(v) }
  override def hashCode(): Int = super.hashCode()
}
object GraftParquetScan {

  /** Runtime-filter observability. AQE re-planning rebuilds scan
    * instances between rounds, so the instance that executes (and prunes)
    * is often not the one visible in the final plan tree — these
    * JVM-global mirrors let tests and metrics see the last prune/call
    * regardless of which instance the engine drove. */
  val filterCalls = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile var lastFilePruneGlobal: Option[(Int, Int)] = None
  // (bytes before, bytes after) of the same prune — the WORK metric:
  // local wall-clock hides file-skip wins once everything is page-cached
  @volatile var lastBytePruneGlobal: Option[(Long, Long)] = None

  /** Engine-shaped runtime IN predicate — `FieldReference`/`LiteralValue`
    * are `private[sql]`, so tests outside the bridge build theirs here. */
  def inPredicate(col: String, dt: DataType, values: Seq[Any]): V2Predicate =
    new V2Predicate("IN",
      (FieldReference.column(col) +:
        values.map(v => LiteralValue(v, dt): org.apache.spark.sql.connector.expressions.Expression)).toArray)

  private val MaxPruneFiles = 1 << 20 // beyond this, skip the footer pass
  // (path, length, column) -> per-file [min, max] from row-group footers;
  // None = stats unusable for that column (always keep)
  private val rangeCache =
    new ConcurrentHashMap[(String, Long, String), Option[(Any, Any)]]()

  private[graft] def clearCache(): Unit = rangeCache.clear()

  /** Footer-stats containment: keep the file unless its [min,max] for
    * `col` excludes EVERY runtime value. Unreadable/missing stats keep
    * the file — pruning must never turn IO trouble into wrong results. */
  def fileMayContain(conf: org.apache.hadoop.conf.Configuration, path: Path,
      len: Long, col: String, dt: DataType, vals: Array[Any]): Boolean =
    fileRange(conf, path, len, col, dt) match {
      case Some((lo, hi)) =>
        val ord = catalystOrdering(dt).get
        vals.exists(v => ord.lteq(lo, v) && ord.lteq(v, hi))
      case None => true
    }

  /** Cached per-file [min, max] for `col` from the row-group footers, in
    * the Catalyst-internal value space; None = stats unusable (caller must
    * keep the file). */
  private def fileRange(conf: org.apache.hadoop.conf.Configuration,
      path: Path, len: Long, col: String, dt: DataType): Option[(Any, Any)] = {
    if (rangeCache.size() > MaxPruneFiles) return None
    rangeCache.computeIfAbsent((path.toString, len, col), _ =>
      Try {
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(path, conf))
        try {
          val stats = reader.getFooter.getBlocks.asScala.toSeq.flatMap { b =>
            b.getColumns.asScala.find(_.getPath.toDotString == col)
              .map(_.getStatistics)
          }
          if (stats.isEmpty || stats.exists(s =>
              s == null || !s.hasNonNullValue || s.isEmpty)) None
          else {
            val mins = stats.map(s =>
              parquetStatValue(s.genericGetMin.asInstanceOf[AnyRef], dt))
            val maxs = stats.map(s =>
              parquetStatValue(s.genericGetMax.asInstanceOf[AnyRef], dt))
            if (mins.contains(None) || maxs.contains(None)) None
            else {
              implicit val ord: Ordering[Any] = catalystOrdering(dt).get
              Some((mins.flatten.min, maxs.flatten.max))
            }
          }
        } finally reader.close()
      }.toOption.flatten.filter(_ => catalystOrdering(dt).isDefined))
  }

  /** Can `fileMayMatch` possibly refute this pushed filter from footer
    * ranges? (Filters it cannot evaluate keep every file — used to skip
    * the footer pass entirely when nothing is refutable.) */
  def prunable(f: sources.Filter): Boolean = f match {
    case sources.And(l, r) => prunable(l) || prunable(r)
    case sources.Or(l, r) => prunable(l) && prunable(r)
    case _: sources.EqualTo | _: sources.In | _: sources.GreaterThan |
         _: sources.GreaterThanOrEqual | _: sources.LessThan |
         _: sources.LessThanOrEqual => true
    case _ => false
  }

  /** Static-filter footer containment: keep the file unless its [min,max]
    * ranges PROVE the pushed filter can match no row. Conservative on
    * every unknown (missing stats, unsupported type/shape, nested column):
    * pruning must never turn a stats gap into wrong results. Values in
    * `sources.Filter` are EXTERNAL Scala types (String, java dates) —
    * converted to the Catalyst-internal space the cached footer ranges
    * live in before comparing. */
  def fileMayMatch(conf: org.apache.hadoop.conf.Configuration, path: Path,
      len: Long, schema: StructType, filter: sources.Filter): Boolean = {
    def range(col: String): Option[((Any, Any), Ordering[Any], Any => Any)] =
      schema.fields.find(_.name == col).flatMap { f =>
        catalystOrdering(f.dataType).flatMap { ord =>
          val conv = CatalystTypeConverters.createToCatalystConverter(f.dataType)
          fileRange(conf, path, len, col, f.dataType).map((_, ord, conv))
        }
      }
    def may(f: sources.Filter): Boolean = f match {
      case sources.And(l, r) => may(l) && may(r)
      case sources.Or(l, r) => may(l) || may(r)
      case sources.EqualTo(c, v) => range(c).forall { case ((lo, hi), ord, conv) =>
        val cv = conv(v); ord.lteq(lo, cv) && ord.lteq(cv, hi)
      }
      case sources.In(c, vs) => range(c).forall { case ((lo, hi), ord, conv) =>
        vs.exists { v =>
          val cv = conv(v); ord.lteq(lo, cv) && ord.lteq(cv, hi)
        }
      }
      case sources.GreaterThan(c, v) => range(c).forall { case ((_, hi), ord, conv) =>
        ord.gt(hi, conv(v))
      }
      case sources.GreaterThanOrEqual(c, v) => range(c).forall { case ((_, hi), ord, conv) =>
        ord.gteq(hi, conv(v))
      }
      case sources.LessThan(c, v) => range(c).forall { case ((lo, _), ord, conv) =>
        ord.lt(lo, conv(v))
      }
      case sources.LessThanOrEqual(c, v) => range(c).forall { case ((lo, _), ord, conv) =>
        ord.lteq(lo, conv(v))
      }
      case _ => true
    }
    may(filter)
  }

  /** Parquet footer stat -> the Catalyst-internal value space the runtime
    * filter values live in (UTF8String for strings, Int for dates). */
  private def parquetStatValue(raw: AnyRef, dt: DataType): Option[Any] =
    (raw, dt) match {
      case (v: java.lang.Integer, _: IntegerType | _: DateType) => Some(v.intValue)
      case (v: java.lang.Long, _: LongType) => Some(v.longValue)
      case (v: java.lang.Integer, _: ShortType) => Some(v.shortValue)
      case (v: java.lang.Integer, _: ByteType) => Some(v.byteValue)
      case (v: java.lang.Float, _: FloatType) => Some(v.floatValue)
      case (v: java.lang.Double, _: DoubleType) => Some(v.doubleValue)
      case (b: org.apache.parquet.io.api.Binary, _: StringType) =>
        Some(org.apache.spark.unsafe.types.UTF8String.fromBytes(b.getBytes))
      case _ => None
    }

  private def catalystOrdering(dt: DataType): Option[Ordering[Any]] = dt match {
    case _: IntegerType | _: DateType => Some(Ordering.Int.on[Any](_.asInstanceOf[Int]))
    case _: LongType => Some(Ordering.Long.on[Any](_.asInstanceOf[Long]))
    case _: ShortType => Some(Ordering.Short.on[Any](_.asInstanceOf[Short]))
    case _: ByteType => Some(Ordering.Byte.on[Any](_.asInstanceOf[Byte]))
    case _: FloatType => Some(Ordering.Float.TotalOrdering.on[Any](_.asInstanceOf[Float]))
    case _: DoubleType => Some(Ordering.Double.TotalOrdering.on[Any](_.asInstanceOf[Double]))
    case _: StringType => Some(Ordering.comparatorToOrdering(
      (a: Any, b: Any) => a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        .compareTo(b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])))
    case _ => None
  }
}

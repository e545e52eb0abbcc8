package graft.streaming

import java.util.{Map => JMap}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.{DeletionVectors, IcebergScan}

/** STREAMING SOURCE over the built-in Iceberg tables — the
  * [[DeltaStreamProvider]] twin, a DataSource-V2 `MicroBatchStream`:
  *
  * {{{
  * spark.readStream
  *   .format("graft.streaming.IcebergStreamProvider")
  *   .option("startingVersion", "1")   // default 1 = existing content first
  *   .load(tablePath)
  * }}}
  *
  * Offsets are METADATA VERSIONS (the version-hint integers, exclusive
  * start / inclusive end): each micro-batch reads exactly the data
  * files newly committed by the versions in range, planned by
  * [[IcebergScan.versionIncrement]]'s live-set diff — so progress is
  * transactional and a checkpoint restart resumes at the committed
  * version with no duplicates. Append-only contract: `replace`
  * snapshots (compaction/recluster) are verified row-preserving and
  * SKIPPED; delete/overwrite/rollback commits and live row-level
  * delete files fail the stream loudly — a streaming consumer cannot
  * retract rows it already emitted.
  *
  * Scale shape: planning reads only the new versions' metadata JSON +
  * manifests (KBs); each data file becomes one input partition read by
  * a plain parquet-mr scan executor-side (the shared
  * [[DeltaFileReaderFactory]]). Scope: primitive top-level columns,
  * INT64-micros timestamps (same remedy message as the Delta twin).
  *
  * ADMISSION CONTROL: same contract as the Delta twin —
  * `.option("maxFilesPerTrigger", n)` / `.option("maxBytesPerTrigger",
  * b)` bound each micro-batch (byte sizes from the manifests'
  * file_size_in_bytes, no filesystem stat), offsets address mid-commit
  * file positions (`{"version":v,"index":i}` over the version's
  * SORTED new-file list), at least one file always admitted, bare
  * `{"version":v}` checkpoints read as fully-consumed, and
  * `Trigger.AvailableNow` pins its drain target at query start. */
class IcebergStreamProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    IcebergScan.tableSchema(SparkSession.active,
      IcebergStreamSource.pathOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new IcebergStreamTable(schema,
      IcebergStreamSource.pathOf(new CaseInsensitiveStringMap(properties)))

  override def supportsExternalMetadata(): Boolean = false
}

private[streaming] class IcebergStreamTable(schema: StructType, path: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft-iceberg-stream(`$path`)"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new IcebergMicroBatchStream(path, schema,
            Option(options.get("startingVersion")).map(_.toLong).getOrElse(1L),
            Option(options.get("maxFilesPerTrigger")).map(_.toInt),
            Option(options.get("maxBytesPerTrigger")).map(_.toLong))
      }
    }
}

/** Stream position: metadata versions `< version` fully consumed, plus
  * the first `index` new files of `version` (sorted-path order).
  * `index = Long.MaxValue` = whole version consumed (what bare
  * `{"version":v}` pre-admission checkpoints deserialize to). */
private[streaming] case class IcebergStreamOffset(version: Long, index: Long)
    extends Offset {
  override def json(): String = s"""{"version":$version,"index":$index}"""
}

private[streaming] class IcebergMicroBatchStream(
    path: String, schema: StructType, startingVersion: Long,
    maxFilesPerTrigger: Option[Int], maxBytesPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def spark = SparkSession.active

  maxFilesPerTrigger.foreach(n => require(n > 0,
    s"maxFilesPerTrigger must be positive, got $n"))
  maxBytesPerTrigger.foreach(b => require(b > 0,
    s"maxBytesPerTrigger must be positive, got $b"))

  /** one version's NEW data files (sorted-path order — the offset
    * contract) with hive partition values + manifest byte size; memo
    * bounded like the Delta twin's (both planning calls per trigger
    * walk the same versions) */
  private val incrMemo =
    new java.util.LinkedHashMap[Long, IndexedSeq[DeltaAddFile]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: JMap.Entry[Long, IndexedSeq[DeltaAddFile]]): Boolean = size() > 64
    }

  private def filesOf(v: Long): IndexedSeq[DeltaAddFile] = incrMemo.synchronized {
    val hit = incrMemo.get(v)
    if (hit != null) return hit
    // identity-partitioned tables: the hive path segments carry each
    // file's partition values (this writer's layout); loud otherwise
    val partNames = IcebergScan.partitionSpecNames(spark, path)
    val r = IcebergScan.versionIncrementSized(spark, path, v.toInt).map {
      case (abs, bytes) =>
        val pv: Map[String, String] =
          if (partNames.isEmpty) Map.empty
          else graft.sources.IcebergWrite.hivePathValues(abs, partNames)
            .getOrElse(throw new IllegalArgumentException(
              s"data file $abs of $path carries no hive segments for " +
                s"partition columns ${partNames.mkString(", ")} — the " +
                "streaming source reads path-derivable layouts only"))
            .map { case (k, ov) => k -> ov.orNull }
        DeltaAddFile(abs, pv, bytes)
    }.toIndexedSeq
    incrMemo.put(v, r)
    r
  }

  override def initialOffset(): Offset =
    IcebergStreamOffset(startingVersion - 1, Long.MaxValue)

  @volatile private var availableNowEnd: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(IcebergScan.latestMetadataVersion(spark, path).toLong)

  override def getDefaultReadLimit: ReadLimit =
    StreamAdmission.defaultLimit(maxFilesPerTrigger, maxBytesPerTrigger)

  override def reportLatestOffset(): Offset =
    IcebergStreamOffset(
      IcebergScan.latestMetadataVersion(spark, path).toLong, Long.MaxValue)

  override def latestOffset(): Offset = reportLatestOffset()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[IcebergStreamOffset]
    val caps = StreamAdmission.capsOf(limit)
    val latest =
      availableNowEnd.getOrElse(IcebergScan.latestMetadataVersion(spark, path).toLong)
    var (curV, curI) = (s.version, s.index)
    var (files, bytes) = (0L, 0L)
    var v = if (s.index == Long.MaxValue) s.version + 1 else s.version
    while (v <= latest) {
      val adds = filesOf(v)
      var i = if (v == s.version && s.index != Long.MaxValue)
        math.min(s.index, adds.size.toLong).toInt else 0
      while (i < adds.size) {
        if (!caps.accepts(files, bytes, adds(i).bytes))
          return IcebergStreamOffset(curV, curI)
        files += 1; bytes += adds(i).bytes
        curV = v; curI = i + 1L
        i += 1
      }
      v += 1
    }
    // post-loop = everything through `latest` consumed (caps return
    // mid-loop); only a genuinely unchanged log returns the start offset
    if (files == 0L && latest <= s.version) IcebergStreamOffset(s.version, s.index)
    else IcebergStreamOffset(latest, Long.MaxValue)
  }

  override def deserializeOffset(json: String): Offset = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    IcebergStreamOffset(node.get("version").asLong(),
      Option(node.get("index")).map(_.asLong()).getOrElse(Long.MaxValue))
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[IcebergStreamOffset]
    val e = end.asInstanceOf[IcebergStreamOffset]
    if (e.version < s.version ||
        (e.version == s.version && e.index <= s.index)) return Array.empty
    val parts = Seq.newBuilder[InputPartition]
    var v = if (s.index == Long.MaxValue) s.version + 1 else s.version
    while (v <= e.version) {
      val adds = filesOf(v)
      val from = if (v == s.version && s.index != Long.MaxValue)
        math.min(s.index, adds.size.toLong).toInt else 0
      val to = if (v == e.version)
        math.min(e.index, adds.size.toLong).toInt else adds.size
      (from until to).foreach { i =>
        parts += DeltaFilePartition(adds(i).abs, adds(i).partitionValues)
      }
      v += 1
    }
    parts.result().toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DeltaFileReaderFactory(schema,
      new DeletionVectors.ConfHolder(spark.sparkContext.hadoopConfiguration))
}

private[streaming] object IcebergStreamSource {
  def pathOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-iceberg-stream needs a table path: .load(path) or .option(\"path\", ...)"))
}

package graft.streaming

import java.util.{Map => JMap}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
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
  * INT64-micros timestamps (same remedy message as the Delta twin). */
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
            Option(options.get("startingVersion")).map(_.toLong).getOrElse(1L))
      }
    }
}

/** offset = highest metadata version already processed */
private[streaming] case class IcebergVersionOffset(version: Long) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

private[streaming] class IcebergMicroBatchStream(
    path: String, schema: StructType, startingVersion: Long)
    extends MicroBatchStream {

  private def spark = SparkSession.active

  override def initialOffset(): Offset = IcebergVersionOffset(startingVersion - 1)

  override def latestOffset(): Offset =
    IcebergVersionOffset(IcebergScan.latestMetadataVersion(spark, path).toLong)

  override def deserializeOffset(json: String): Offset =
    IcebergVersionOffset(new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(json).get("version").asLong())

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[IcebergVersionOffset].version
    val to = end.asInstanceOf[IcebergVersionOffset].version
    if (to <= from) return Array.empty
    // identity-partitioned tables: the hive path segments carry each
    // file's partition values (this writer's layout); loud otherwise
    val partNames = IcebergScan.partitionSpecNames(spark, path)
    ((from + 1) to to).flatMap { v =>
      IcebergScan.versionIncrement(spark, path, v.toInt).map { abs =>
        val pv: Map[String, String] =
          if (partNames.isEmpty) Map.empty
          else graft.sources.IcebergWrite.hivePathValues(abs, partNames)
            .getOrElse(throw new IllegalArgumentException(
              s"data file $abs of $path carries no hive segments for " +
                s"partition columns ${partNames.mkString(", ")} — the " +
                "streaming source reads path-derivable layouts only"))
            .map { case (k, ov) => k -> ov.orNull }
        DeltaFilePartition(abs, pv): InputPartition
      }
    }.toArray
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

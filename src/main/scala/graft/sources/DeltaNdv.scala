package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Delta twin of [[IcebergNdv]]: ANALYZE computes one DataSketches
  * HLL NDV sketch per column in a single distributed aggregation pass
  * over the delete-applied read and records them TRANSACTIONALLY in a
  * `graft.statistics` domain-metadata action — the protocol's
  * table-scoped key-value channel (the same mechanism
  * `delta.clustering` uses), gated by the `domainMetadata` writer
  * feature so feature-unaware writers cannot corrupt the domain.
  *
  * VERSION SCOPING (the parity of Iceberg's snapshot-scoped
  * `statistics` field): the read is pinned to the table version
  * observed BEFORE the aggregation, and the domain commits at exactly
  * that version + 1 — a concurrent commit taking the slot fails the
  * CAS loudly instead of stamping stale sketches as current.
  * [[tableStatistics]] serves the stats only while the table is still
  * AT the recording version; any later commit (even metadata-only)
  * conservatively invalidates — stale NDV is never served silently,
  * the exact-or-absent contract [[MetaAgg]] set for metadata answers.
  * Re-ANALYZE after data changes; analyze every column a workload
  * prices in ONE pass (sketches for all columns ride one action).
  *
  * Sketch payloads ride base64 in the domain configuration, so
  * disjoint passes stay mergeable ([[IcebergNdv.mergedNdv]]); NDV
  * consumers that only need the estimate read the `ndv` field without
  * touching the bytes. `fieldId` is -1 throughout — Delta addresses
  * columns by (physical) name, not id.
  *
  * Scale shape: ONE aggregation job (HLL partial-merges map-side), a
  * driver row of ncols KB-sized sketches, one metadata CAS. */
object DeltaNdv {

  val Domain = "graft.statistics"

  private val mapper = new ObjectMapper()

  private def sketchCol(f: org.apache.spark.sql.types.StructField) = {
    import org.apache.spark.sql.types._
    f.dataType match {
      case IntegerType | LongType | StringType | BinaryType => col(f.name)
      case _ => col(f.name).cast(StringType)
    }
  }

  /** ANALYZE: per-column NDV sketches for the CURRENT version.
    * `columns` empty = every column. Returns the recorded stats. */
  def analyze(spark: SparkSession, tablePath: String,
      columns: Seq[String] = Nil): Seq[IcebergNdv.ColumnStats] = {
    val analyzedV = DeltaScan.latestVersion(spark, tablePath)
    val df = DeltaScan.read(spark, tablePath, versionAsOf = Some(analyzedV))
    val wanted = if (columns.nonEmpty) columns else df.schema.fieldNames.toSeq
    wanted.foreach(c => require(df.schema.fieldNames.contains(c),
      s"analyze column '$c' is not a column of $tablePath"))
    val fields = wanted.map(df.schema(_))
    val row = df.agg(
      hll_sketch_agg(sketchCol(fields.head)).as(fields.head.name),
      fields.tail.map(f => hll_sketch_agg(sketchCol(f)).as(f.name)): _*
    ).head() // [lint:bounded] one row of ncols KB-sized sketches
    val stats = fields.zipWithIndex.map { case (f, i) =>
      val bytes = row.getAs[Array[Byte]](i)
      // driver-side estimate (IcebergNdv.sketchEstimate) — the
      // expression form costs a one-row Spark job per column
      IcebergNdv.ColumnStats(f.name, fieldId = -1,
        ndv = IcebergNdv.sketchEstimate(bytes), sketch = bytes)
    }

    val cfg = mapper.createObjectNode()
    cfg.put("tableVersion", analyzedV + 1)
    val cols = cfg.putArray("columns")
    stats.foreach { s =>
      val c = cols.addObject()
      c.put("name", s.column)
      c.put("ndv", s.ndv)
      c.put("sketch", java.util.Base64.getEncoder.encodeToString(s.sketch))
    }
    DeltaWrite.commitDomainMetadataAt(spark, tablePath, Domain,
      mapper.writeValueAsString(cfg), operation = "ANALYZE",
      version = analyzedV + 1)
    stats
  }

  /** the recorded statistics, or None when absent or STALE (any
    * commit after the recording version invalidates — see the
    * version-scoping note above) */
  def tableStatistics(spark: SparkSession,
      tablePath: String): Option[Seq[IcebergNdv.ColumnStats]] = {
    val cfg = DeltaScan.domainMetadata(spark, tablePath).get(Domain)
      .getOrElse(return scala.None)
    val node = mapper.readTree(cfg)
    val at = node.get("tableVersion").asLong()
    if (DeltaScan.latestVersion(spark, tablePath) != at) return scala.None
    Some(scala.jdk.CollectionConverters
      .IteratorHasAsScala(node.get("columns").elements()).asScala.map { c =>
        IcebergNdv.ColumnStats(
          column = c.get("name").asText(),
          fieldId = -1,
          ndv = c.get("ndv").asLong(),
          sketch = java.util.Base64.getDecoder.decode(c.get("sketch").asText()))
      }.toSeq)
  }
}

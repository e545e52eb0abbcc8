package graft.sources

import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dependency-free read of Delta Lake tables — the `delta_scan` analog
  * (reference: src/TidierDB.jl:209-212 runs it via a DuckDB extension).
  * No connector jar required: the Delta transaction log is plain
  * JSON-lines + parquet checkpoints (protocol spec at
  * github.com/delta-io/delta/blob/master/PROTOCOL.md), so the snapshot
  * is reconstructed with Spark itself and the data files are read as
  * ordinary parquet.
  *
  * Supported: JSON commits, single- AND multi-part parquet checkpoints +
  * `_last_checkpoint`, add/remove replay, partitioned tables (both
  * hive-layout dirs and explicit partitionValues), `versionAsOf` time
  * travel, schema from the latest metaData action, column mapping
  * (`name` and `id` modes — Delta writers store physical names in the
  * parquet under both, so resolution is by physical name), and
  * DELETION VECTORS (storage types u/i/p; decoded by
  * [[DeletionVectors]] and applied as an anti-join on the file-source
  * `_metadata.row_index`). Unsupported (fails with a clear message
  * rather than wrong answers): unknown reader table features. V2
  * checkpoints (UUID-named top files, parquet or JSON, with file
  * actions in parquet sidecars) read natively.
  *
  * 100 TB shape: log replay is DISTRIBUTED — commit JSONs and the
  * checkpoint are read as DataFrames and the live-file set is one
  * window over a shuffle on the file path (exactly how Delta's own
  * Spark snapshot reconstruction works). Only the live PATH LIST is
  * collected for planning (~100 B/file — the same driver-side file
  * index any format keeps); data files are then scanned as parquet
  * with the usual pushdown/pruning, and hive-layout partition values
  * become real partition columns (partition pruning works). Deletion
  * vectors decode in EXECUTORS (one task per DV file, memory bounded
  * by the descriptor's declared cardinality) and the deleted-position
  * set joins against `_metadata.(file_path, row_index)` — broadcast
  * when the total declared cardinality is small, sort-merge otherwise.
  */
object DeltaScan {

  /** Schema for the action columns we replay (a projection of the
    * protocol's action union — unknown fields are ignored by the JSON
    * reader, which is exactly the forward-compat story the protocol
    * prescribes for readers). */
  private val actionSchema = StructType(Seq(
    StructField("add", StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("dataChange", BooleanType),
      StructField("stats", StringType),
      StructField("deletionVector", StructType(Seq(
        StructField("storageType", StringType),
        StructField("pathOrInlineDv", StringType),
        StructField("offset", IntegerType),
        StructField("sizeInBytes", IntegerType),
        StructField("cardinality", LongType))))))),
    StructField("remove", StructType(Seq(
      StructField("path", StringType),
      StructField("dataChange", BooleanType)))),
    StructField("metaData", StructType(Seq(
      StructField("id", StringType),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType))))),
    StructField("protocol", StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("readerFeatures", ArrayType(StringType)))))))

  private val supportedReaderFeatures =
    Set("timestampNtz", "deletionVectors", "columnMapping", "v2Checkpoint")

  /** Resolve the checkpoint top file(s) at `v`: classic single file,
    * multi-part (`parts` from `_last_checkpoint`), or a V2 UUID-named
    * top file (`<v>.checkpoint.<uniqueStr>.{parquet,json}`). Returns
    * (paths, isJson, isV2Named) — V2 tops are the only ones that may
    * carry `sidecar` actions. */
  private[sources] def checkpointTopFiles(fs: FileSystem, logDir: Path,
      v: Long, parts: Option[Int]): (Seq[String], Boolean, Boolean) = parts match {
    case Some(n) if n > 1 =>
      ((1 to n).map(i =>
        new Path(logDir, f"$v%020d.checkpoint.$i%010d.$n%010d.parquet").toString),
        false, false)
    case _ =>
      val classic = new Path(logDir, f"$v%020d.checkpoint.parquet")
      if (fs.exists(classic)) (Seq(classic.toString), false, false)
      else {
        // v2 naming: one dot-free uniqueStr segment (multi-part names
        // have two numeric segments, so they never match)
        val names = fs.listStatus(logDir).toSeq.map(_.getPath.getName)
        val pqc = names.filter(_.matches(f"$v%020d\\.checkpoint\\.[A-Za-z0-9-]+\\.parquet"))
        val jsc = names.filter(_.matches(f"$v%020d\\.checkpoint\\.[A-Za-z0-9-]+\\.json"))
        if (pqc.nonEmpty) (Seq(new Path(logDir, pqc.max).toString), false, true)
        else if (jsc.nonEmpty) (Seq(new Path(logDir, jsc.max).toString), true, true)
        else throw new IllegalStateException(
          s"_last_checkpoint names version $v but no checkpoint file exists in $logDir")
      }
  }

  /** Broadcast the deleted-position set below this many total rows
    * (~16 B/row → ≤64 MB); above it, let sort-merge handle the anti
    * join so nothing large pins executor memory. */
  private val dvBroadcastRows = 4L * 1000 * 1000

  private val physNameKey = "delta.columnMapping.physicalName"

  /** RFC 3986 percent-decode for Delta action paths: ONLY `%XX`
    * sequences decode (as UTF-8); '+' stays literal. Form-decoding
    * (URLDecoder, '+'→' ') would mis-name files from writers that
    * leave '+' unencoded — delta-spark does — and a mis-decoded
    * tracked set makes vacuum classify a live `a+b.parquet` as an
    * orphan. Malformed escapes pass through RAW rather than throwing,
    * so a legacy log with raw `%`-bearing hive paths degrades to the
    * old byte-identical comparison, never to a crash or a rename. */
  private[graft] def percentDecode(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%') {
        if (i + 2 >= s.length) return s
        val hi = Character.digit(s.charAt(i + 1), 16)
        val lo = Character.digit(s.charAt(i + 2), 16)
        if (hi < 0 || lo < 0) return s
        out.write((hi << 4) | lo)
        i += 3
      } else {
        val cp = s.codePointAt(i)
        out.write(new String(Character.toChars(cp)).getBytes(StandardCharsets.UTF_8))
        i += Character.charCount(cp)
      }
    }
    new String(out.toByteArray, StandardCharsets.UTF_8)
  }

  /** Latest committed version of the table (max JSON commit number,
    * or the checkpoint version when the JSON tail was fully
    * truncated). */
  def latestVersion(spark: SparkSession, tablePath: String): Long = {
    val (fs, versions) = listLog(spark, tablePath)
    val cp = lastCheckpoint(spark, fs, new Path(tablePath, "_delta_log"))
    require(versions.nonEmpty || cp.nonEmpty,
      s"no Delta log found under $tablePath/_delta_log")
    (versions ++ cp.map(_._1)).max
  }

  /** The table as a DataFrame, at `versionAsOf` if given else the
    * latest version.
    *
    * `skippingFilter`: a predicate over the table's columns that is
    * BOTH applied to the rows (the result is exactly `read(...)
    * .filter(f)`) and evaluated against each live file's `stats`
    * (numRecords/minValues/maxValues/nullCount, written by
    * [[DeltaWrite]] from the parquet footers) so files the stats prove
    * irrelevant are never opened — Delta data skipping. Pruning is
    * conservative: files without stats, non-conjunct predicate shapes,
    * and columns outside the stats always stay in. */
  def read(spark: SparkSession, tablePath: String, versionAsOf: Option[Long] = None,
      skippingFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val st = liveState(spark, tablePath, versionAsOf)
    readFromState(spark, tablePath, st, skippingFilter)
  }

  /** One live data file of the reconstructed snapshot: decoded absolute
    * path, partition values, deletion-vector descriptor, raw `stats`
    * JSON — exactly what [[read]] plans from, exposed so metadata-only
    * consumers ([[MetaAgg]]) answer from the SAME replay (protocol
    * gates, checkpoints, last-action-wins) the row reads use. */
  private[graft] final case class LiveFile(
      path: String, pv: Map[String, String],
      dv: Option[DeletionVectors.Descriptor], stats: Option[String])

  /** the snapshot's logical state: schema, partitioning, table config,
    * column-mapping flag, and the live file set */
  private[graft] final case class LiveState(
      schema: StructType, partCols: Seq[String],
      conf: Map[String, String], columnMapped: Boolean,
      files: Seq[LiveFile])

  /** log replay up to `versionAsOf` (default: latest) — the shared
    * front half of [[read]]: checkpoint + JSON tail, protocol gates,
    * metaData resolution, last-action-per-path live-set reconstruction,
    * planning-size guard. Metadata I/O only; no data file is opened. */
  private[graft] def liveState(spark: SparkSession, tablePath: String,
      versionAsOf: Option[Long] = None): LiveState = {
    val (fs, versions) = listLog(spark, tablePath)
    // a checkpoint with a fully-truncated JSON tail is a legal table
    // state (everything up to the checkpoint version was vacuumed from
    // the log) — the checkpoint IS the latest version then
    val cpOnly = lastCheckpoint(spark, fs, new Path(tablePath, "_delta_log"))
    require(versions.nonEmpty || cpOnly.nonEmpty,
      s"no Delta log found under $tablePath/_delta_log")
    val target = versionAsOf.getOrElse(
      (versions ++ cpOnly.map(_._1)).max)
    require(versions.contains(target) || cpOnly.exists(_._1 == target),
      s"version $target not present in $tablePath/_delta_log" +
        (if (versions.nonEmpty) s" (have ${versions.min}..${versions.max})" else " (checkpoint only)"))

    val logDir = new Path(tablePath, "_delta_log")
    // checkpoint usable only if it is at or before the target version
    val checkpoint = lastCheckpoint(spark, fs, logDir).filter(_._1 <= target)
    val cpVersion = checkpoint.map(_._1).getOrElse(-1L)
    val jsonVersions = versions.filter(v => v > cpVersion && v <= target)
    require(checkpoint.nonEmpty || jsonVersions.contains(0L),
      s"Delta log at $tablePath is truncated before version 0 and no usable checkpoint exists")

    // DRIVER-SIDE FAST REPLAY (guide §1.2 step 1 / §2.4 — remove jobs
    // that do no data work): a JSON-only log is replayed with Jackson
    // on the driver instead of a spark.read.json scan + a window
    // shuffle + toLocalIterator — on small logs the distributed replay
    // is 2-3 Spark jobs of pure scheduling overhead per read, and
    // every Delta read pays it. Same last-action-wins semantics, same
    // protocol/metaData gates, same PlanningGuard accounting (asserted
    // equivalent by DeltaScanSpec's fast-vs-distributed check). The
    // distributed path stays for checkpointed tables (the checkpoint
    // is a data-sized parquet artifact that belongs in executors) and
    // for JSON tails past `maxDriverReplayBytes` — a 100 TB table has
    // a checkpoint (auto-checkpointing every 10 commits), so the
    // driver never replays an unbounded log.
    if (driverReplayEnabled && checkpoint.isEmpty && jsonVersions.nonEmpty &&
        jsonVersions.map(v => fs.getFileStatus(
          new Path(logDir, f"$v%020d.json")).getLen).sum <= maxDriverReplayBytes)
      return liveStateDriver(fs, tablePath, logDir, jsonVersions)

    val jsonActs =
      if (jsonVersions.isEmpty) None
      else Some(spark.read.schema(actionSchema)
        .json(jsonVersions.map(v => new Path(logDir, f"$v%020d.json").toString): _*)
        .withColumn("__v",
          regexp_extract(input_file_name(), "(\\d+)\\.json", 1).cast("long")))
    // reading the checkpoint with OUR action schema projects away the
    // extra checkpoint fields (stats, txn, ...) and nulls out any field
    // a given writer version didn't emit, so both sources union cleanly
    val cpActs = checkpoint.map { case (v, parts) =>
      val (cpFiles, isJson, isV2Named) = checkpointTopFiles(fs, logDir, v, parts)
      def rd(paths: Seq[String], sch: StructType) =
        if (isJson) spark.read.schema(sch).json(paths: _*)
        else spark.read.schema(sch).parquet(paths: _*)
      val top = rd(cpFiles, actionSchema).withColumn("__v", lit(v))
      if (!isV2Named) top
      else {
        // V2 checkpoint: file actions may live in parquet SIDECARS
        // under _delta_log/_sidecars (top file then carries only
        // non-file actions + the sidecar pointers)
        val sidecarSchema = StructType(Seq(StructField("sidecar",
          StructType(Seq(StructField("path", StringType))))))
        val scPaths = rd(cpFiles, sidecarSchema)
          .select(col("sidecar.path").as("p")).filter(col("p").isNotNull)
          .collect().map(_.getString(0)).toSeq.sorted // [lint:bounded] one row per sidecar FILE
        if (scPaths.isEmpty) top
        else top.unionByName(
          spark.read.schema(actionSchema).parquet(scPaths.map { p =>
            if (p.contains("://") || p.startsWith("/")) p
            else new Path(logDir, s"_sidecars/$p").toString
          }: _*).withColumn("__v", lit(v)))
      }
    }
    val acts = (cpActs.toSeq ++ jsonActs.toSeq).reduce(_ unionByName _)

    // ---- protocol / metadata gates --------------------------------------
    val proto = acts.filter(col("protocol.minReaderVersion").isNotNull)
      .orderBy(col("__v").desc).select("protocol.*").collect().headOption // [lint:bounded] one protocol row
    proto.foreach { p =>
      val minReader = p.getInt(0)
      val feats = Option(p.getSeq[String](1)).getOrElse(Seq.empty)
      // 1 = base, 2 = legacy column mapping, 3 = table features (must
      // all be understood, else loud).
      require(minReader <= 2 || (minReader == 3 && feats.forall(supportedReaderFeatures)),
        s"Delta reader protocol $minReader with features $feats is not supported " +
          "by the built-in reader (unsupported: " +
          s"${feats.filterNot(supportedReaderFeatures).mkString(", ")})")
    }
    val meta = acts.filter(col("metaData.id").isNotNull)
      .orderBy(col("__v").desc).select("metaData.*").collect().headOption // [lint:bounded] one metaData row
      .getOrElse(throw new IllegalStateException(
        s"Delta log at $tablePath has no metaData action"))
    val conf = Option(meta.getMap[String, String](3)).map(_.toMap).getOrElse(Map.empty)
    val cmMode = conf.getOrElse("delta.columnMapping.mode", "none")
    require(Set("none", "name", "id")(cmMode),
      s"Delta column mapping mode '$cmMode' is not in the protocol (none/name/id)")
    val columnMapped = cmMode != "none"
    val schema = DataType.fromJson(meta.getString(1)).asInstanceOf[StructType]
    val partCols = Option(meta.getSeq[String](2)).getOrElse(Seq.empty)

    // ---- live-file reconstruction: last action per path wins ------------
    val addsDf = acts.filter(col("add.path").isNotNull)
      .select(col("add.path").as("p"), col("__v"), lit(1).as("isAdd"),
        col("add.partitionValues").as("pv"), col("add.deletionVector").as("dv"),
        col("add.stats").as("st"))
    val dvType = actionSchema("add").dataType.asInstanceOf[StructType]("deletionVector").dataType
    val removesDf = acts.filter(col("remove.path").isNotNull)
      .select(col("remove.path").as("p"), col("__v"), lit(0).as("isAdd"),
        lit(null).cast(MapType(StringType, StringType)).as("pv"),
        lit(null).cast(dvType).as("dv"),
        lit(null).cast(StringType).as("st"))
    val w = Window.partitionBy("p").orderBy(col("__v").desc, col("isAdd").desc)
    val liveDf = addsDf.unionByName(removesDf)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("isAdd") === 1)
      .select("p", "pv", "dv", "st")
    // planning-size guard: the live-file array is O(file count) DRIVER
    // memory — refuse loudly past the bound ([[PlanningGuard]]) instead
    // of OOMing mid-plan at 100 TB x small files. The guard must fire
    // BEFORE the array exists, so accumulate through toLocalIterator
    // (one partition resident at a time) and count AS rows arrive —
    // an oversized table aborts with at most one partition + the
    // so-far buffer on the driver, never the whole live set
    val liveBuf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    var planBytes = 0L
    scala.jdk.CollectionConverters.IteratorHasAsScala(
      liveDf.toLocalIterator()).asScala.foreach { r => // [lint:bounded] one action row per live data FILE (log metadata, not data); guarded incrementally
      planBytes += 96L + r.getString(0).length +
        (if (r.isNullAt(3)) 0L else r.getString(3).length.toLong)
      PlanningGuard.check(tablePath, liveBuf.length + 1L, planBytes)
      liveBuf += r
    }
    val live = liveBuf.toArray

    val allFiles = live.map { r =>
      val rel = percentDecode(r.getString(0))
      val pv = if (r.isNullAt(1)) Map.empty[String, String]
               else r.getMap[String, String](1).toMap
      val dv = if (r.isNullAt(2) || r.getStruct(2).isNullAt(0)) None else {
        val d = r.getStruct(2)
        Some(DeletionVectors.Descriptor(
          d.getString(0), d.getString(1),
          if (d.isNullAt(2)) None else Some(d.getInt(2)),
          d.getInt(3), d.getLong(4)))
      }
      val st = if (r.isNullAt(3)) None else Some(r.getString(3))
      LiveFile(new Path(tablePath, rel).toString, pv, dv, st)
    }
    LiveState(schema, partCols, conf, columnMapped, allFiles.toSeq)
  }

  /** JSON-tail byte cap for the driver-side replay; past it (or with
    * any checkpoint present) the distributed replay runs. Env override
    * for ops; the default comfortably covers every no-checkpoint log
    * (auto-checkpointing bounds tails to ~10 commits). */
  private[sources] val maxDriverReplayBytes: Long =
    sys.env.get("GRAFT_DELTA_DRIVER_REPLAY_MAX_BYTES").map(_.toLong)
      .getOrElse(128L << 20)

  /** test hook: DeltaScanSpec forces the distributed replay to assert
    * the two replays reconstruct identical snapshots */
  @volatile private[graft] var driverReplayEnabled = true

  /** Driver twin of the distributed replay in [[liveState]] — Jackson
    * over the JSON tail, zero Spark jobs. Semantics mirrored exactly:
    * last action per path wins, an add beats a remove within one
    * version (the window's `(__v DESC, isAdd DESC)` — DV re-add
    * commits), protocol actions without `minReaderVersion` and
    * metaData actions without `id` are ignored (the schema-projection
    * filters), and the planning-size guard sees the same per-file
    * byte estimate. */
  private def liveStateDriver(fs: FileSystem, tablePath: String,
      logDir: Path, jsonVersions: Seq[Long]): LiveState = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    import com.fasterxml.jackson.databind.JsonNode
    def opt(n: JsonNode, f: String): Option[JsonNode] =
      Option(n.get(f)).filterNot(_.isNull)
    // (version, isAdd, add-node or null) per path
    val latest = scala.collection.mutable.LinkedHashMap
      .empty[String, (Long, Boolean, JsonNode)]
    var proto: Option[JsonNode] = scala.None
    var meta: Option[JsonNode] = scala.None
    jsonVersions.sorted.foreach { v =>
      val p = new Path(logDir, f"$v%020d.json")
      val in = fs.open(p)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toList finally in.close()
      lines.foreach { ln =>
        if (ln.nonEmpty) {
          val node = mapper.readTree(ln)
          if (node.has("add")) {
            val a = node.get("add")
            opt(a, "path").map(_.asText()).foreach { path =>
              if (latest.get(path).forall(_._1 <= v)) // add wins same-v ties
                latest(path) = (v, true, a)
            }
          } else if (node.has("remove")) {
            opt(node.get("remove"), "path").map(_.asText()).foreach { path =>
              if (latest.get(path).forall(c => c._1 < v || (c._1 == v && !c._2)))
                latest(path) = (v, false, null)
            }
          } else if (node.has("metaData")) {
            if (opt(node.get("metaData"), "id").nonEmpty)
              meta = Some(node.get("metaData"))
          } else if (node.has("protocol")) {
            if (opt(node.get("protocol"), "minReaderVersion").nonEmpty)
              proto = Some(node.get("protocol"))
          }
        }
      }
    }

    proto.foreach { p =>
      val minReader = p.get("minReaderVersion").asInt()
      val feats = opt(p, "readerFeatures")
        .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Seq.empty)
      require(minReader <= 2 || (minReader == 3 && feats.forall(supportedReaderFeatures)),
        s"Delta reader protocol $minReader with features $feats is not supported " +
          "by the built-in reader (unsupported: " +
          s"${feats.filterNot(supportedReaderFeatures).mkString(", ")})")
    }
    val md = meta.getOrElse(throw new IllegalStateException(
      s"Delta log at $tablePath has no metaData action"))
    val conf = opt(md, "configuration").map(c =>
      c.properties().asScala.map(e =>
        e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText())).toMap)
      .getOrElse(Map.empty[String, String])
    val cmMode = conf.getOrElse("delta.columnMapping.mode", "none")
    require(Set("none", "name", "id")(cmMode),
      s"Delta column mapping mode '$cmMode' is not in the protocol (none/name/id)")
    val columnMapped = cmMode != "none"
    val schema = DataType.fromJson(md.get("schemaString").asText())
      .asInstanceOf[StructType]
    val partCols = opt(md, "partitionColumns")
      .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Seq.empty)

    var planBytes = 0L
    val files = scala.collection.mutable.ArrayBuffer.empty[LiveFile]
    latest.foreach { case (rawPath, (_, isAdd, a)) =>
      if (isAdd) {
        val stats = opt(a, "stats").map(_.asText())
        planBytes += 96L + rawPath.length + stats.fold(0L)(_.length.toLong)
        PlanningGuard.check(tablePath, files.length + 1L, planBytes)
        val pv = opt(a, "partitionValues").map(p =>
          p.properties().asScala.map(e =>
            e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText())).toMap)
          .getOrElse(Map.empty[String, String])
        val dv = opt(a, "deletionVector").filter(d => opt(d, "storageType").nonEmpty)
          .map { d =>
            DeletionVectors.Descriptor(
              d.get("storageType").asText(), d.get("pathOrInlineDv").asText(),
              opt(d, "offset").map(_.asInt()),
              d.get("sizeInBytes").asInt(), d.get("cardinality").asLong())
          }
        files += LiveFile(
          new Path(tablePath, percentDecode(rawPath)).toString, pv, dv, stats)
      }
    }
    LiveState(schema, partCols, conf, columnMapped, files.toSeq)
  }

  /** the back half of [[read]]: plan the scan over a reconstructed
    * [[LiveState]] (skipping, DV anti-join, column mapping, layout) */
  private[sources] def readFromState(spark: SparkSession, tablePath: String,
      state: LiveState,
      skippingFilter: Option[org.apache.spark.sql.Column]): DataFrame = {
    val schema = state.schema
    val partCols = state.partCols
    val conf = state.conf
    val columnMapped = state.columnMapped
    val allFiles = state.files.map(f => (f.path, f.pv, f.dv, f.stats))
    // ---- data skipping: stats prove a file can hold no matching row -----
    // generated-column partitioning: each file's partition VALUE implies
    // bounds on the SOURCE column (the same sourceBounds mapping Iceberg
    // hidden partitioning prunes with) — merged into the stats the
    // pruner consumes, for source columns the footer stats don't cover
    // (stats-less files: foreign writers, stats disabled). Footer stats
    // win when present (they are at least as tight). Skipped on
    // column-mapped tables (pv is keyed by physical names there).
    // session-TZ-dependent shapes (day/month/year over TimestampType)
    // may only imply source bounds when the write TZ is known UTC —
    // graft stamps the property at create; a foreign table written
    // under another TZ would yield bounds that exclude rows actually
    // in the file (wrong results, not just weaker pruning)
    val utcWritten =
      conf.get(DeltaTransforms.WriteTimezoneKey).contains("UTC")
    val genPfs =
      if (columnMapped) Seq.empty
      else DeltaTransforms.generatedFields(schema)
        .filter(g => partCols.contains(g._1.name))
        .flatMap { case (f2, sql) =>
          DeltaTransforms.parseGenExpr(f2.name, sql, schema) }
        .filter(pf => utcWritten || DeltaTransforms.tzIndependent(pf))
    def withPartBounds(st0: Option[ParquetStats.FileStats],
        pv: Map[String, String]): Option[ParquetStats.FileStats] =
      if (genPfs.isEmpty) st0
      else {
        var st = st0.getOrElse(
          ParquetStats.FileStats(-1L, Map.empty, Map.empty, Map.empty))
        genPfs.foreach { pf =>
          for {
            raw <- pv.get(pf.specName)
            typed <- DeltaTransforms.decodePartValue(pf, raw)
            (lo, hi) <- IcebergTransforms.sourceBounds(pf, typed)
          } {
            if (!st.min.contains(pf.source.name))
              DeltaTransforms.comparable(pf.source.dataType, lo)
                .foreach(v => st = st.copy(min = st.min + (pf.source.name -> v)))
            if (!st.max.contains(pf.source.name))
              Option(hi).flatMap(DeltaTransforms.comparable(pf.source.dataType, _))
                .foreach(v => st = st.copy(max = st.max + (pf.source.name -> v)))
          }
        }
        Some(st)
      }
    val files = skippingFilter match {
      case None => allFiles.map { case (p, pv, dv, _) => (p, pv, dv) }
      case Some(f) =>
        val pred = ParquetStats.predicateExpr(spark, schema, f)
        allFiles.collect {
          case (p, pv, dv, st)
              if ParquetStats.mayMatch(
                withPartBounds(st.flatMap(ParquetStats.parse), pv), pred) =>
            (p, pv, dv)
        }
    }
    def withFilter(df: DataFrame): DataFrame =
      skippingFilter.fold(df)(df.filter)
    if (files.isEmpty) return withFilter(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))

    // ---- deletion vectors: decode in executors, one anti-join key set ---
    // key by the file's URI form: `_metadata.file_path` re-encodes
    // hive-escaped dir names ('%' → '%25'), so the raw path string
    // would sit in a different namespace and the anti-join would
    // silently skip those files' DVs (resurrecting deleted rows)
    val dvEntries = files.collect { case (p, _, Some(d)) =>
      (normalizePath(new Path(p).toUri.toString), d) }
    val deletedPos: Option[DataFrame] = if (dvEntries.isEmpty) None else {
      import spark.implicits._
      val bcConf = spark.sparkContext.broadcast(
        new DeletionVectors.ConfHolder(spark.sessionState.newHadoopConf()))
      val work = dvEntries.map { case (p, d) =>
        (p, d.storageType, d.pathOrInlineDv, d.offset.getOrElse(-1), d.sizeInBytes, d.cardinality)
      }.toSeq
      val pos = spark.createDataset(work)
        .repartition(math.min(work.size, 64))
        .flatMap { case (p, st, ref, off, size, card) =>
          DeletionVectors.readPositions(bcConf.value.value, tablePath,
            DeletionVectors.Descriptor(st, ref, if (off < 0) None else Some(off), size, card))
            .map(pos => (p, pos))
        }.toDF("__file", "__pos")
      val totalCard = dvEntries.map(_._2.cardinality).sum
      Some(if (totalCard <= dvBroadcastRows) broadcast(pos) else pos)
    }

    /** Anti-join the deleted (file, row) pairs against a fresh file scan.
      * `_metadata` is the file source's own row identity — no row ids are
      * invented, and with no DVs present the scan is untouched. */
    def applyDv(scan: DataFrame): DataFrame = deletedPos match {
      case None => scan
      case Some(posDf) =>
        val out = scan.columns // data columns only, no helpers
        scan
          .withColumn("__file", normalizePathCol(col("_metadata.file_path")))
          .withColumn("__pos", col("_metadata.row_index"))
          .join(posDf, Seq("__file", "__pos"), "left_anti")
          .select(out.map(col).toSeq: _*)
    }

    // ---- column mapping: read physical names, project back to logical ---
    val dataFields = schema.fields.filterNot(f => partCols.contains(f.name))
    val readSchema =
      if (columnMapped) StructType(dataFields.map(f =>
        StructField(physicalName(f), physicalType(f.dataType), f.nullable)))
      else StructType(dataFields)

    /** Physical → logical projection: rename top-level columns and cast
      * nested structs (struct casts match by POSITION, so nested fields
      * pick their logical names back up with zero data movement). */
    def toLogical(df: DataFrame): DataFrame =
      if (!columnMapped) df
      else df.select(dataFields.map(f =>
        col(physicalName(f)).cast(f.dataType).as(f.name)).toSeq: _*)

    val fieldType = schema.fields.map(f => f.name -> f.dataType).toMap
    val pvKey: String => String =
      if (columnMapped) {
        val byLogical = schema.fields.map(f => f.name -> physicalName(f)).toMap
        c => byLogical(c)
      } else identity

    // ---- data read ------------------------------------------------------
    if (partCols.isEmpty) {
      withFilter(toLogical(applyDv(
        spark.read.schema(readSchema).parquet(files.map(_._1).toSeq: _*))))
    } else {
      // absolute-path adds (a shallow clone of a partitioned source) sit
      // OUTSIDE the table root, so the basePath branch would be rejected
      // by Spark ('Wrong basePath') — those take the value-injection
      // fallback below, which reads each partition group by explicit path
      val inRoot = new Path(tablePath).toString + "/"
      val hiveLayout = !columnMapped &&
        files.forall { case (p, _, _) =>
          p.startsWith(inRoot) && partCols.forall(c => p.contains(s"$c=")) }
      if (hiveLayout) {
        // scale path: partition values parse from the directory names and
        // cast to the table schema; partition pruning stays effective
        withFilter(applyDv(spark.read.option("basePath", tablePath).schema(schema)
          .parquet(files.map(_._1).toSeq: _*))
          .select(schema.fieldNames.map(col).toSeq: _*))
      } else {
        // exact fallback: group files by partition tuple, inject literals.
        // Plan size grows with DISTINCT partition tuples - fine for modest
        // partition counts, hive-layout tables take the branch above.
        withFilter(files.groupBy(_._2).map { case (pv, group) =>
          val dataDf = toLogical(applyDv(
            spark.read.schema(readSchema).parquet(group.map(_._1).toSeq: _*)))
          partCols.foldLeft(dataDf) { (d, c) =>
            d.withColumn(c, lit(pv.get(pvKey(c)).orNull).cast(fieldType(c)))
          }.select(schema.fieldNames.map(col).toSeq: _*)
        }.reduce(_ unionByName _))
      }
    }
  }

  /** CHANGE DATA FEED READ (protocol §Add CDC File): the row-level
    * changes committed in versions `[fromVersion, toVersion]`, as the
    * table columns + `_change_type`
    * (insert / delete / update_preimage / update_postimage) +
    * `_commit_version`. Per protocol semantics:
    *
    *  - a commit carrying `cdc` actions serves EXACTLY those change
    *    files (written by [[DeltaWrite]]'s update/delete/merge when
    *    `delta.enableChangeDataFeed` is set);
    *  - a commit with no cdc actions and no data-changing remove is
    *    insert-only: its `dataChange=true` adds ARE the inserts;
    *  - a data-changing remove without cdc refuses loudly — the
    *    removed rows are not reconstructible from the log.
    *
    * Schema is resolved as of `toVersion`; older change files read
    * missing columns as NULL by name. */
  def readCdf(spark: SparkSession, tablePath: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    require(fromVersion >= 0 && toVersion >= fromVersion,
      s"bad version range [$fromVersion, $toVersion]")
    val (fs, versions) = listLog(spark, tablePath)
    val missing = (fromVersion to toVersion).filterNot(versions.contains)
    require(missing.isEmpty,
      s"Delta log at $tablePath is missing JSON commits ${missing.mkString(", ")} — " +
        "cannot serve the change feed; recompute from snapshots")
    val st = liveState(spark, tablePath, Some(toVersion))
    require(!st.columnMapped,
      "readCdf on a column-mapped table is not supported by the built-in reader")
    val outSchema = StructType(st.schema.fields ++ Seq(
      StructField("_change_type", StringType),
      StructField("_commit_version", LongType)))
    val logDir = new Path(tablePath, "_delta_log")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val fieldType = st.schema.fields.map(f => f.name -> f.dataType).toMap
    val dataFields = StructType(
      st.schema.fields.filterNot(f => st.partCols.contains(f.name)))

    /** read one version's (path, pv) groups with `extraCols` appended
      * to the read schema, partition values injected as typed literals */
    def readGroup(files: Seq[(String, Map[String, String])],
        withChangeType: Boolean, v: Long): DataFrame = {
      val readSchema =
        if (withChangeType)
          StructType(dataFields.fields :+ StructField("_change_type", StringType))
        else dataFields
      files.groupBy(_._2).toSeq.sortBy(_._2.head._1).map { case (pv, group) =>
        val base = spark.read.schema(readSchema)
          .parquet(group.map(g => new Path(tablePath, g._1).toString): _*)
        val withParts = st.partCols.foldLeft(base) { (d, c) =>
          d.withColumn(c, lit(pv.get(c)
            .filterNot(x => x == null || x == "__HIVE_DEFAULT_PARTITION__")
            .orNull).cast(fieldType(c)))
        }
        val typed =
          if (withChangeType) withParts
          else withParts.withColumn("_change_type", lit("insert"))
        typed.withColumn("_commit_version", lit(v))
          .select(outSchema.fieldNames.map(col).toSeq: _*)
      }.reduce(_ unionByName _)
    }

    val perVersion: Seq[DataFrame] = (fromVersion to toVersion).flatMap { v =>
      val in = fs.open(new Path(logDir, f"$v%020d.json"))
      val nodes = (try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()).map(mapper.readTree)
      def pvOf(n: com.fasterxml.jackson.databind.JsonNode): Map[String, String] =
        Option(n.get("partitionValues")).map(_.properties().asScala.map(e =>
          e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText())).toMap)
          .getOrElse(Map.empty)
      val cdcs = nodes.filter(_.has("cdc")).map(_.get("cdc"))
        .map(c => (percentDecode(c.get("path").asText()), pvOf(c)))
      if (cdcs.nonEmpty) Some(readGroup(cdcs, withChangeType = true, v))
      else {
        val badRemove = nodes.exists(n => n.has("remove") &&
          Option(n.get("remove").get("dataChange")).forall(_.asBoolean(true)))
        require(!badRemove,
          s"version $v of $tablePath removes data without cdc actions — " +
            "the change feed cannot reconstruct the deleted rows (commit " +
            "predates enableChangeDataFeed, or a non-CDF writer ran DML)")
        val adds = nodes.filter(n => n.has("add") &&
            Option(n.get("add").get("dataChange")).forall(_.asBoolean(true)))
          .map(_.get("add"))
        adds.foreach(a => require(
          a.get("deletionVector") == null || a.get("deletionVector").isNull,
          s"version $v add carries a deletion vector — not expressible as a " +
            "change feed by this reader"))
        if (adds.isEmpty) scala.None
        else Some(readGroup(
          adds.map(a => (percentDecode(a.get("path").asText()), pvOf(a))),
          withChangeType = false, v))
      }
    }
    if (perVersion.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
    else perVersion.reduce(_ unionByName _)
  }

  /** Data-changing ADD file paths (absolute) committed in versions
    * `(fromExclusive, toInclusive]` — the incremental-consumer view of
    * an append-only table. Per the protocol, `dataChange=false`
    * actions (compaction swaps, [[DeltaWrite.compact]]) are SKIPPED —
    * their rows were already consumed under their original files. A
    * `dataChange=true` REMOVE in the range (a real delete/rewrite) or
    * an add carrying a deletion vector fails loudly: an incremental
    * consumer cannot express those as a pure increment and must fall
    * back to a full recompute. Requires the range's JSON commits to
    * still exist (they are recent by construction; vacuuming a log
    * faster than its consumers read it is operator error). */
  def changedAddsBetween(
      spark: SparkSession,
      tablePath: String,
      fromExclusive: Long,
      toInclusive: Long): Seq[String] = {
    require(fromExclusive <= toInclusive,
      s"bad version range ($fromExclusive, $toInclusive]")
    if (fromExclusive == toInclusive) return Seq.empty
    val (_, versions) = listLog(spark, tablePath)
    val want = (fromExclusive + 1) to toInclusive
    val missing = want.filterNot(versions.contains)
    require(missing.isEmpty,
      s"Delta log at $tablePath is missing JSON commits ${missing.mkString(", ")} — " +
        "cannot read the increment; recompute from the full snapshot")
    val logDir = new Path(tablePath, "_delta_log")
    val acts = spark.read.schema(actionSchema)
      .json(want.map(v => new Path(logDir, f"$v%020d.json").toString): _*)
    val badRemoves = acts
      .filter(col("remove.path").isNotNull && col("remove.dataChange"))
      .limit(1).count()
    require(badRemoves == 0,
      s"Delta table $tablePath has data-changing removes in ($fromExclusive, " +
        s"$toInclusive] — not an append-only increment; recompute from the full snapshot")
    val adds = acts
      .filter(col("add.path").isNotNull && col("add.dataChange"))
      .select(col("add.path"), col("add.deletionVector.storageType"),
        col("add.partitionValues"))
      .collect() // [lint:bounded] one row per incremental add action (log metadata)
    adds.foreach { r =>
      require(r.isNullAt(1),
        s"Delta increment add ${r.getString(0)} carries a deletion vector — " +
          "not an append-only increment; recompute from the full snapshot")
      val pv = if (r.isNullAt(2)) Map.empty[String, String] else r.getMap[String, String](2)
      require(pv.isEmpty,
        s"Delta increment add ${r.getString(0)} is partitioned — incremental " +
          "consumers support unpartitioned tables only")
    }
    adds.map(r => new Path(tablePath,
      percentDecode(r.getString(0))).toString).toSeq
  }

  /** INCREMENTAL READ — the rows appended in versions `(fromExclusive,
    * toInclusive]` as a DataFrame (the CDC-consumer surface for
    * append-only tables; [[graft.operators.Rollup.maintain]] is built
    * on the same contract). Strict by construction: data-changing
    * removes, deletion vectors, or partitioned adds in the range fail
    * loudly toward a full-snapshot recompute — an increment that is
    * not purely appended rows must never be served as one. Empty
    * range / metadata-only commits → empty frame with the table
    * schema. */
  def readChanges(
      spark: SparkSession,
      tablePath: String,
      fromExclusive: Long,
      toInclusive: Long): DataFrame = {
    val files = changedAddsBetween(spark, tablePath, fromExclusive, toInclusive)
    // both branches carry the table's LOGICAL schema; a bare
    // parquet-read would surface physical column names on
    // column-mapped tables and an inference-dependent schema otherwise
    val template = read(spark, tablePath, Some(toInclusive)).limit(0)
    if (files.isEmpty) template
    else {
      val raw = spark.read.parquet(files: _*)
      require(template.schema.fieldNames.forall(raw.columns.contains),
        s"Delta increment files of $tablePath do not carry the table's logical " +
          "column names (column-mapped table?) — incremental consumers support " +
          "direct-named tables only; recompute from the full snapshot")
      spark.read.schema(template.schema).parquet(files: _*)
    }
  }

  /** `timestampAsOf` time travel: the table at the LAST version whose
    * commit landed at or before `ts` (epoch millis). Version timestamps
    * prefer IN-COMMIT evidence — `commitInfo.timestamp`, else the max
    * `add.modificationTime` in the commit — falling back to the commit
    * file's mtime only when neither exists: object stores and
    * copy/restore operations rewrite file mtimes arbitrarily, and a
    * restored log must not silently travel to the wrong version. Fails
    * loudly when `ts` precedes the first commit. */
  def readTimestampAsOf(spark: SparkSession, tablePath: String, tsMillis: Long): DataFrame = {
    val (fs, versions) = listLog(spark, tablePath)
    require(versions.nonEmpty,
      s"no Delta log found under $tablePath/_delta_log (timestamp travel needs the JSON tail)")
    val logDir = new Path(tablePath, "_delta_log")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val stamped = versions.sorted.map { v =>
      val p = new Path(logDir, f"$v%020d.json")
      val in = fs.open(p)
      // stream the lines and STOP at the first commitInfo (connectors
      // put it first or last; either way this caps the common case at
      // one or few lines instead of parsing the whole commit) — only a
      // commitInfo-less commit pays the full scan for its max add time
      var commitInfoTs = Option.empty[Long]
      var maxAddTs = Option.empty[Long]
      try {
        val it = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        while (commitInfoTs.isEmpty && it.hasNext) {
          val n = mapper.readTree(it.next())
          if (n.has("commitInfo") && n.get("commitInfo").has("timestamp"))
            commitInfoTs = Some(n.get("commitInfo").get("timestamp").asLong())
          else if (n.has("add") && n.get("add").has("modificationTime")) {
            val t = n.get("add").get("modificationTime").asLong()
            if (maxAddTs.forall(_ < t)) maxAddTs = Some(t)
          }
        }
      } finally in.close()
      val ts = commitInfoTs
        .orElse(maxAddTs)
        .getOrElse(fs.getFileStatus(p).getModificationTime)
      v -> ts
    }
    val eligible = stamped.filter(_._2 <= tsMillis)
    require(eligible.nonEmpty,
      s"timestamp $tsMillis precedes the first commit of $tablePath " +
        s"(earliest ${stamped.map(_._2).min})")
    read(spark, tablePath, Some(eligible.map(_._1).max))
  }

  /** ROW-LEVEL CHANGES between two versions, computed as a SNAPSHOT
    * DIFF (`exceptAll` both ways): every row in `to` but not `from` is
    * an `insert`, the reverse a `delete`; an UPDATE appears as its
    * delete+insert pair (change-feed-without-preimage semantics). This
    * is the AUDIT-path CDC — exact for any commit mix (row-level DML,
    * compaction, restore), at the cost of reading both snapshots (two
    * scans + one shuffle each). The INCREMENTAL path for append-only
    * ranges is [[readChanges]], which reads only the new files. */
  def changesBetween(spark: SparkSession, tablePath: String,
      fromVersion: Long, toVersion: Long): DataFrame =
    snapshotDiff(read(spark, tablePath, Some(fromVersion)),
      read(spark, tablePath, Some(toVersion)))

  private[sources] def snapshotDiff(before: DataFrame, after: DataFrame): DataFrame =
    after.exceptAll(before).withColumn("_change_type", lit("insert"))
      .unionByName(
        before.exceptAll(after).withColumn("_change_type", lit("delete")))

  /** HISTORY metadata table (the operational DESCRIBE HISTORY
    * surface): one row per JSON commit — version, timestamp (the same
    * in-commit-evidence preference as [[readTimestampAsOf]]: commitInfo
    * > max add.modificationTime > file mtime), action counts, whether
    * the commit re-declared metaData or protocol, and its txn appIds.
    * Driver-side metadata, O(commits) — a long-lived table reads this
    * after [[DeltaWrite.checkpoint]]-based log cleanup, so the row set
    * is the JSON tail, not all of history. */
  def history(spark: SparkSession, tablePath: String): DataFrame = {
    val (fs, versions) = listLog(spark, tablePath)
    val logDir = new Path(tablePath, "_delta_log")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val rows = versions.sorted.map { v =>
      val p = new Path(logDir, f"$v%020d.json")
      var commitInfoTs = Option.empty[Long]
      var operation = Option.empty[String]
      var maxAddTs = Option.empty[Long]
      var (nAdds, nRemoves) = (0L, 0L)
      var (metaChanged, protoChanged) = (false, false)
      val txns = Seq.newBuilder[String]
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().foreach { line =>
        val n = mapper.readTree(line)
        if (n.has("commitInfo") && n.get("commitInfo").has("timestamp"))
          commitInfoTs = Some(n.get("commitInfo").get("timestamp").asLong())
        if (n.has("commitInfo") && n.get("commitInfo").has("operation"))
          operation = Some(n.get("commitInfo").get("operation").asText())
        if (n.has("add")) {
          nAdds += 1
          if (n.get("add").has("modificationTime")) {
            val t = n.get("add").get("modificationTime").asLong()
            if (maxAddTs.forall(_ < t)) maxAddTs = Some(t)
          }
        }
        if (n.has("remove")) nRemoves += 1
        if (n.has("metaData")) metaChanged = true
        if (n.has("protocol")) protoChanged = true
        if (n.has("txn")) txns += n.get("txn").get("appId").asText()
      } finally in.close()
      val ts = commitInfoTs.orElse(maxAddTs)
        .getOrElse(fs.getFileStatus(p).getModificationTime)
      org.apache.spark.sql.Row(v, ts, operation.orNull, nAdds, nRemoves,
        metaChanged, protoChanged, txns.result())
    }
    spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava,
      StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("timestamp_ms", LongType, nullable = false),
        StructField("operation", StringType),
        StructField("num_added_files", LongType, nullable = false),
        StructField("num_removed_files", LongType, nullable = false),
        StructField("metadata_changed", BooleanType, nullable = false),
        StructField("protocol_changed", BooleanType, nullable = false),
        StructField("txn_app_ids", ArrayType(StringType), nullable = false))))
  }

  /** Collapse `scheme://host` prefixes so the planner-side path strings
    * and `_metadata.file_path` compare equal regardless of how the
    * FileSystem qualified them. */
  private[sources] def normalizePath(p: String): String =
    p.replaceFirst("^[A-Za-z][A-Za-z0-9+.\\-]*:/+", "/")

  private[sources] def normalizePathCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(c, "^[A-Za-z][A-Za-z0-9+.\\-]*:/+", "/")

  private[sources] def physicalName(f: StructField): String =
    if (f.metadata.contains(physNameKey)) f.metadata.getString(physNameKey) else f.name

  /** Recursively rewrite a logical type to its physical (on-disk) shape:
    * struct fields take their `delta.columnMapping.physicalName`. */
  private[sources] def physicalType(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      StructField(physicalName(f), physicalType(f.dataType), f.nullable)))
    case a: ArrayType => a.copy(elementType = physicalType(a.elementType))
    case m: MapType =>
      m.copy(keyType = physicalType(m.keyType), valueType = physicalType(m.valueType))
    case other => other
  }

  /** All commit versions present as JSON files, plus the FileSystem. */
  private def listLog(spark: SparkSession, tablePath: String): (FileSystem, Seq[Long]) = {
    val logDir = new Path(tablePath, "_delta_log")
    val fs = logDir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(logDir)) return (fs, Seq.empty)
    val versions = fs.listStatus(logDir).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.matches("\\d{20}\\.json") => n.stripSuffix(".json").toLong }
    (fs, versions.sorted)
  }

  /** `_last_checkpoint` → (version, parts), if present. */
  /** Current DOMAIN METADATA state (PROTOCOL §Domain Metadata): domain
    * → configuration for every domain whose latest action is not a
    * `removed` tombstone — checkpoint state first, JSON tail overrides
    * by domain. Driver-side walk of the tail only (domain actions are
    * a handful of bytes per commit; the checkpoint reads through
    * spark.read with a domain-only projection). The clustered-table
    * surface ([[clusteringColumns]]) sits on top. */
  def domainMetadata(spark: SparkSession, tablePath: String): Map[String, String] = {
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val logDir = new Path(fs.makeQualified(new Path(tablePath)), "_delta_log")
    require(fs.exists(logDir), s"no Delta table at $tablePath")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val cp = lastCheckpoint(spark, fs, logDir)
    // (domain -> (configuration, removed)), oldest..newest application
    var state = Map.empty[String, (String, Boolean)]
    cp.foreach { case (v, parts) =>
      val (cpFiles, isJson, _) = checkpointTopFiles(fs, logDir, v, parts)
      val domainType = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("domain", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("configuration", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("removed", org.apache.spark.sql.types.BooleanType)))
      val sch = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("domainMetadata", domainType)))
      val df = if (isJson) spark.read.schema(sch).json(cpFiles: _*)
               else spark.read.schema(sch).parquet(cpFiles: _*)
      df.filter(org.apache.spark.sql.functions.col("domainMetadata.domain").isNotNull)
        .select("domainMetadata.domain", "domainMetadata.configuration",
          "domainMetadata.removed")
        .collect() // [lint:bounded] one row per metadata DOMAIN
        .foreach { r =>
          state += r.getString(0) ->
            (Option(r.getString(1)).getOrElse(""),
              !r.isNullAt(2) && r.getBoolean(2))
        }
    }
    val from = cp.map(_._1 + 1).getOrElse(0L)
    val to = latestVersion(spark, tablePath)
    (from to to).foreach { v =>
      val p = new Path(logDir, f"$v%020d.json")
      if (fs.exists(p)) {
        val in = fs.open(p)
        val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
          finally in.close()
        lines.map(mapper.readTree).filter(_.has("domainMetadata")).foreach { n =>
          val d = n.get("domainMetadata")
          state += d.get("domain").asText() ->
            (Option(d.get("configuration")).map(_.asText()).getOrElse(""),
              Option(d.get("removed")).exists(_.asBoolean(false)))
        }
      }
    }
    state.collect { case (k, (cfg, false)) => k -> cfg }
  }

  /** the table's clustering columns (PHYSICAL names, top-level) from
    * the `delta.clustering` domain — empty when not a clustered table */
  def clusteringColumns(spark: SparkSession, tablePath: String): Seq[String] =
    domainMetadata(spark, tablePath).get("delta.clustering").toSeq.flatMap { cfg =>
      if (cfg.isEmpty) Seq.empty
      else {
        val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(cfg)
        import scala.jdk.CollectionConverters.IteratorHasAsScala
        Option(node.get("clusteringColumns")).toSeq.flatMap(a =>
          a.elements().asScala.map { parts =>
            parts.elements().asScala.map(_.asText()).mkString(".")
          }.toSeq)
      }
    }

  private[sources] def lastCheckpoint(
      spark: SparkSession, fs: FileSystem, logDir: Path): Option[(Long, Option[Int])] = {
    val p = new Path(logDir, "_last_checkpoint")
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(txt)
    val version = node.get("version").asLong()
    val parts = Option(node.get("parts")).map(_.asInt())
    Some((version, parts))
  }
}

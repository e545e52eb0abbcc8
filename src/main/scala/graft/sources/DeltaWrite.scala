package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal dependency-free Delta Lake WRITER — the sink half of the
  * built-in lakehouse support (reader: [[DeltaScan]]). Writes the
  * public transaction-log protocol directly: data files are plain
  * parquet written by Spark's own writer (hive layout when
  * partitioned), each commit is one `_delta_log/%020d.json` with
  * `protocol`/`metaData` (version 0) and `add` actions.
  *
  * Scope is deliberately the SINGLE-WRITER case (create + append):
  * no optimistic-concurrency loop, no checkpoints, no compaction —
  * a second concurrent writer could clobber a commit, exactly the
  * guarantee real connectors add on top of this same file format.
  * Any engine's Delta reader (including [[DeltaScan]], spec + gate
  * round-tripped) reads the result.
  *
  * Scale: the data write is Spark's distributed parquet writer —
  * partitioning, task parallelism, and file sizing are untouched; the
  * log commit is one driver-side metadata file listing only the NEW
  * files (~100 B each), the same planning-index cost every Delta
  * writer pays.
  */
object DeltaWrite {

  /** Create a new Delta table at `tablePath` (commit 0). Fails if a
    * Delta log already exists there. */
  def create(spark: SparkSession, df: DataFrame, tablePath: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(new Path(tablePath, "_delta_log")),
      s"Delta log already exists at $tablePath — use append")
    commit(spark, fs, df, tablePath, partitionBy, version = 0L)
  }

  /** Append `df` as a new commit. Partitioning must match the table's
    * (validated against the data layout Spark produces). */
  def append(spark: SparkSession, df: DataFrame, tablePath: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = DeltaScan.latestVersion(spark, tablePath) + 1
    commit(spark, fs, df, tablePath, partitionBy, version = v)
  }

  private def commit(spark: SparkSession, fs: FileSystem, df: DataFrame,
      tablePath: String, partitionBy: Seq[String], version: Long): Unit = {
    val root = fs.makeQualified(new Path(tablePath))
    val pre = listDataFiles(fs, root).map(_._1).toSet
    val writer = df.write.mode("append")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(tablePath)
    val post = listDataFiles(fs, root)
    val added = post.filterNot { case (p, _) => pre.contains(p) }
    require(added.nonEmpty, "write produced no data files (empty input?)")

    val now = System.currentTimeMillis()
    val adds = added.map { case (rel, size) =>
      // partition values from the hive path segments col=value
      val pv = rel.split('/').dropRight(1).collect {
        case seg if seg.contains('=') =>
          val Array(k, v) = seg.split("=", 2)
          s"${jstr(k)}:${jstr(hiveUnescape(v))}"
      }.mkString(",")
      s"""{"add":{"path":${jstr(rel)},"partitionValues":{$pv},"size":$size,"modificationTime":$now,"dataChange":true}}"""
    }
    val header =
      if (version == 0L) {
        val schemaJson = df.schema.json // already a JSON document
        val pcols = partitionBy.map(jstr).mkString(",")
        Seq(
          """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
          s"""{"metaData":{"id":${jstr(java.util.UUID.randomUUID().toString)},""" +
            s""""format":{"provider":"parquet","options":{}},""" +
            s""""schemaString":${jstr(schemaJson)},""" +
            s""""partitionColumns":[$pcols],"configuration":{},"createdTime":$now}}""")
      } else Seq.empty
    val logDir = new Path(root, "_delta_log")
    fs.mkdirs(logDir)
    val commitFile = new Path(logDir, f"$version%020d.json")
    require(!fs.exists(commitFile),
      s"commit $commitFile already exists — concurrent writer? (single-writer protocol)")
    val out = fs.create(commitFile, false)
    try out.write((header ++ adds).mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** all data files under the table root, as (relative path, size),
    * excluding the log dir and non-parquet markers */
  private def listDataFiles(fs: FileSystem, root: Path): Seq[(String, Long)] = {
    if (!fs.exists(root)) return Seq.empty
    val rootStr = root.toString.stripSuffix("/") + "/"
    val out = Seq.newBuilder[(String, Long)]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      val p = st.getPath.toString
      if (p.startsWith(rootStr)) {
        val rel = p.substring(rootStr.length)
        if (!rel.startsWith("_delta_log/") && rel.endsWith(".parquet"))
          out += ((rel, st.getLen))
      }
    }
    out.result()
  }

  /** minimal hive-path unescape (%xx sequences) for partition values */
  private def hiveUnescape(s: String): String =
    java.net.URLDecoder.decode(s.replace("+", "%2B"), "UTF-8")

  /** JSON string literal with full control-char escaping */
  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}

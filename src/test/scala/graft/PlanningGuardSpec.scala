package graft

import org.apache.spark.sql.functions._
import graft.sources.{DeltaScan, DeltaWrite, IcebergScan, IcebergWrite, PlanningGuard}

class PlanningGuardSpec extends SparkSpec {
  import spark.implicits._

  test("oversized driver planning state refuses loudly on both formats") {
    val base = java.nio.file.Files.createTempDirectory("graft_plan_guard").toString
    val (ice, delta) = (s"$base/ice", s"$base/delta")
    // three commits → at least 3 live files per table
    IcebergWrite.create(spark, Seq((1L, "a")).toDF("id", "v"), ice)
    IcebergWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), ice)
    IcebergWrite.append(spark, Seq((3L, "c")).toDF("id", "v"), ice)
    DeltaWrite.create(spark, Seq((1L, "a")).toDF("id", "v"), delta)
    DeltaWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), delta)
    DeltaWrite.append(spark, Seq((3L, "c")).toDF("id", "v"), delta)

    val saveF = PlanningGuard.maxFiles
    try {
      PlanningGuard.maxFiles = 2
      val eI = intercept[IllegalStateException](IcebergScan.read(spark, ice))
      assert(eI.getMessage.contains("live file entries") &&
        eI.getMessage.contains("PlanningGuard.maxFiles"), eI.getMessage)
      val eD = intercept[IllegalStateException](DeltaScan.read(spark, delta))
      assert(eD.getMessage.contains("live file entries"), eD.getMessage)
      // the WRITE paths plan through the same walk — DML refuses too,
      // never silently half-plans
      val eW = intercept[IllegalStateException](
        IcebergWrite.deleteWhere(spark, ice, col("id") === 1L))
      assert(eW.getMessage.contains("live file entries"), eW.getMessage)
    } finally PlanningGuard.maxFiles = saveF

    val saveB = PlanningGuard.maxBytes
    try {
      PlanningGuard.maxBytes = 64
      assert(intercept[IllegalStateException](IcebergScan.read(spark, ice))
        .getMessage.contains("bytes of file metadata"))
      assert(intercept[IllegalStateException](DeltaScan.read(spark, delta))
        .getMessage.contains("bytes of file metadata"))
    } finally PlanningGuard.maxBytes = saveB

    // with the default bounds both tables read fine
    assert(IcebergScan.read(spark, ice).count() == 3L)
    assert(DeltaScan.read(spark, delta).count() == 3L)
  }
}

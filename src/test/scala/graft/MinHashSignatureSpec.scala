package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Native MinHash kernel ([[graft.plans.MinHashSignature]]) pinned
  * bit-identical to the k-fold HOF formulation it replaced — the DuckDB
  * gate mirrors reproduce that arithmetic, so any drift here is a
  * silent correctness break of every near-dup gate. */
class MinHashSignatureSpec extends SparkSpec {
  import spark.implicits._

  /** the pre-kernel formulation, kept verbatim as the reference */
  private def hofSignature(bases: Column, numHashes: Int, seed: Long = 42L): Column = {
    val params = Dedup.hashParams(numHashes, seed)
    array(params.map { case (a, b) =>
      array_min(transform(bases, x =>
        pmod(pmod(x, lit(Dedup.MinHashP)) * lit(a) + lit(b), lit(Dedup.MinHashP))))
    }: _*)
  }

  private def sigPairs(df: org.apache.spark.sql.DataFrame, k: Int) = df
    .select(
      Dedup.minHashFromBases(col("bases"), k).as("native"),
      hofSignature(col("bases"), k).as("hof"))
    .collect()
    .map(r => (r.getSeq[Any](0), r.getSeq[Any](1)))

  test("native signature is bit-identical to the HOF formulation") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val n = rnd.nextInt(40) + 1
      // the real domain: 60-bit positive portable hashes — plus a few
      // adversarial values outside it (negative, > p, 0, max)
      val bases = Seq.fill(n)(rnd.nextLong().abs % (1L << 60)) ++
        (if (i % 10 == 0) Seq(-5L, 0L, Long.MaxValue, Dedup.MinHashP, Dedup.MinHashP + 1) else Nil)
      Tuple1(bases)
    }
    sigPairs(rows.toDF("bases"), 12).foreach { case (nat, hof) =>
      assert(nat == hof)
    }
  }

  test("empty array and NULL input both yield k null slots (HOF shape)") {
    val df = Seq(Tuple1(Option(Seq.empty[Long])), Tuple1(Option.empty[Seq[Long]]))
      .toDF("bases")
    sigPairs(df, 6).foreach { case (nat, hof) =>
      assert(nat == Seq.fill(6)(null))
      assert(nat == hof)
    }
  }

  test("codegen and interpreted paths agree") {
    val df = Seq(Tuple1(Seq(3L, 99L, 1234567890123L)), Tuple1(Seq(42L))).toDF("bases")
    val whole = df.select(Dedup.minHashFromBases(col("bases"), 8).as("s")).collect()
    val interp = withSqlConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      df.select(Dedup.minHashFromBases(col("bases"), 8).as("s")).collect()
    }
    assert(whole.map(_.getSeq[Any](0)).toSeq == interp.map(_.getSeq[Any](0)).toSeq)
  }

  private def withSqlConf[A](pairs: (String, String)*)(f: => A): A = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f
    finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}

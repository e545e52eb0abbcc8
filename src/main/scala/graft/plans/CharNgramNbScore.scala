package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: text → predicted language, the fused inference
  * pass of the character-n-gram Naive Bayes classifier trained by
  * [[graft.operators.LangId]] (the real-model replacement for the
  * marker-word `TextFns.langId` heuristic; the reference has no langid
  * at all, this is pipeline-mandate surface).
  *
  * One loop per row: lowercase, slide a codepoint window of size `n`,
  * bucket each gram with the md5 formula every oracle inlines
  * (`('0x'||substr(md5(seed||chr(1)||gram),1,15))::BIGINT % nBuckets`,
  * the [[HashedNgramBuckets]] contract), accumulate each language's
  * integer micro-log-prob from its dense weight array, then argmax
  * (first language in model order wins ties — engine-deterministic).
  * Returns 'und' when the text has no gram (no evidence).
  *
  * Weights ride the expression tree (≤ langs × nBuckets longs, e.g.
  * 8 × 2048 = 128 KB) — serialized once per task like the PQ ADC
  * table, never per row; in generated code they ride a single codegen
  * reference object ([[CharNgramNbScore.Scorer]]), so the inference
  * loop runs inside WholeStageCodegen with one direct call per row
  * (no interpreted dispatch). Scoring is pure BIGINT: bit-identical on
  * any partitioning, any cluster size.
  */
case class CharNgramNbScore(
    child: Expression,
    n: Int,
    nBuckets: Int,
    seed: String,
    langs: Seq[String],
    priorsMicro: Array[Long],
    weightsMicro: Array[Array[Long]])
    extends UnaryExpression {

  require(n >= 1, s"n must be >= 1, got $n")
  require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
  require(langs.nonEmpty, "model must have at least one language")
  require(priorsMicro.length == langs.size && weightsMicro.length == langs.size,
    "priors/weights arity must match langs")
  require(weightsMicro.forall(_.length == nBuckets),
    "each language's weight array must be dense over nBuckets")

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngram_nb_score expects string, got ${other.sql}")
  }

  @transient private lazy val scorer =
    new CharNgramNbScore.Scorer(n, nBuckets, seed, langs.toArray,
      priorsMicro, weightsMicro)

  override def nullSafeEval(input: Any): Any =
    scorer.score(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nbScorer", scorer,
      classOf[CharNgramNbScore.Scorer].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.score($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharNgramNbScore =
    copy(child = newChild)

  override def prettyName: String = "char_ngram_nb_score"
}

object CharNgramNbScore {
  /** the fused inference kernel + its model, as one serializable
    * codegen reference object */
  final class Scorer(
      n: Int,
      nBuckets: Int,
      seed: String,
      langs: Array[String],
      priorsMicro: Array[Long],
      weightsMicro: Array[Array[Long]]) extends Serializable {

    @transient private lazy val langStrs = langs.map(UTF8String.fromString)
    @transient private lazy val und = UTF8String.fromString("und")

    def score(input: UTF8String): UTF8String = {
      val text = input.toLowerCase.toString
      val bks = CharNgramBuckets.bucketsOf(text, n, nBuckets, seed,
        alreadyLower = true)
      if (bks.isEmpty) return und
      val k = langs.length
      val scores = new Array[Long](k)
      var j = 0
      while (j < k) { scores(j) = priorsMicro(j); j += 1 }
      var g = 0
      while (g < bks.length) {
        val b = bks(g)
        j = 0
        while (j < k) { scores(j) += weightsMicro(j)(b); j += 1 }
        g += 1
      }
      var best = 0
      j = 1
      while (j < k) { if (scores(j) > scores(best)) best = j; j += 1 }
      langStrs(best)
    }
  }
}

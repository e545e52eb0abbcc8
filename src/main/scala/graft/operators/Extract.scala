package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Main-content extraction from HTML — the crawl step between WARC
  * payloads and the cleaning pipeline. Published densitometric
  * recipe (Kohlschütter, Fankhauser & Nejdl 2010, "Boilerplate
  * Detection using Shallow Text Features", NumWordsRulesClassifier):
  * segment the page into text blocks, then classify each block as
  * content/boilerplate from the (prev, curr, next) word counts and
  * link densities — no DOM weights, no site templates, and it removes
  * nav/footer/related-links chrome that tag stripping alone keeps.
  *
  * The decision tree, with the paper's 1/3 and 5/9 density thresholds
  * evaluated as EXACT integer cross-multiplications (no float
  * division → cross-engine exact, hash-gateable):
  *
  * {{{
  * curr.linkDensity > 1/3                  → boilerplate
  * else if prev.linkDensity <= 5/9:
  *   curr.words > 16                       → content
  *   else next.words > 15                  → content
  *   else prev.words > 4                   → content else boilerplate
  * else:
  *   curr.words > 40                       → content
  *   else next.words > 17                  → content else boilerplate
  * }}}
  *
  * Missing neighbors count as empty blocks (0 words, density 0), per
  * the reference implementation.
  *
  * Fully narrow: one native segmentation kernel
  * ([[graft.plans.HtmlBlocks]]) + HOF classification — fuses with the
  * scan, zero shuffle, streams unchanged.
  */
object Extract {

  /** array of struct(text, n_words, link_words, is_content) — the
    * classified block stream (inspection / custom policies) */
  def classifiedBlocks(html: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftShim
    val blocks = GraftShim.column(
      graft.plans.HtmlBlocks(GraftShim.expression(html)))
    // named lambda over (index) with neighbors; empty neighbor = 0s
    transform(blocks, (b, i) => {
      // i is 0-based; element_at is 1-based, and BOTH index 0 and
      // out-of-bounds THROW under ANSI (Spark 4 default) — the CASEs
      // guard evaluation itself, not just the value
      val prevRow = when(i >= 1, element_at(blocks, i))
      val prevW = coalesce(prevRow.getField("n_words"), lit(0))
      val prevL = coalesce(prevRow.getField("link_words"), lit(0))
      val nextW = coalesce(
        when(i + 2 <= size(blocks), element_at(blocks, i + 2))
          .getField("n_words"), lit(0))
      val curW = b.getField("n_words")
      val curL = b.getField("link_words")
      // exact rational compares: L/W > 1/3 ⟺ 3L > W ; L/W <= 5/9 ⟺ 9L <= 5W
      val isContent =
        when(curL * 3 > curW, lit(false))
          .when(prevL * 9 <= prevW * 5,
            curW > 16 || nextW > 15 || prevW > 4)
          .otherwise(curW > 40 || nextW > 17)
      struct(
        b.getField("text").as("text"),
        curW.as("n_words"),
        curL.as("link_words"),
        isContent.as("is_content"))
    })
  }

  /** the page's main content: content-classified blocks joined with
    * newlines; empty string when nothing survives */
  def mainContent(html: Column): Column =
    concat_ws("\n",
      transform(
        filter(classifiedBlocks(html), b => b.getField("is_content")),
        b => b.getField("text")))

  /** df + `text` (extracted main content) + `n_blocks` +
    * `n_content_blocks` — the WARC → corpus bridge */
  def extractMainContent(
      df: org.apache.spark.sql.DataFrame,
      htmlCol: String,
      textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    val cb = classifiedBlocks(col(htmlCol))
    df.withColumn("__cb", cb)
      .withColumn(textCol,
        concat_ws("\n", transform(
          filter(col("__cb"), b => b.getField("is_content")),
          b => b.getField("text"))))
      .withColumn("n_blocks", size(col("__cb")).cast("long"))
      .withColumn("n_content_blocks",
        size(filter(col("__cb"), b => b.getField("is_content"))).cast("long"))
      .drop("__cb")
  }
}

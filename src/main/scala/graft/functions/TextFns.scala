package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines
  * (north-star extension beyond the reference — SURVEY §7.3 item 6).
  *
  * Everything is built from codegen'd `functions._` combinators and
  * higher-order array functions — no UDFs — so the whole pipeline stays
  * inside WholeStageCodegen and scales linearly with executors: each
  * document is processed independently (narrow transformations, no
  * shuffle).
  */
object TextFns {

  /** whitespace tokenization, lowercased, empties dropped */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** BPE-ish subword count approximation: whitespace tokens plus an
    * extra unit per 6 chars of word length (long words split by BPE). */
  def tokenCountApprox(text: Column): Column =
    aggregate(
      tokens(text),
      lit(0L),
      // (len/6) via double division + truncating cast == integer div
      // for non-negative lengths (matches SQL len//6)
      (acc, t) => acc + lit(1L) + (length(t) / lit(6)).cast("long"))

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Cross-engine portable 60-bit hash: decimal value of the first 15
    * hex chars of md5. Identical in Spark
    * (`conv(substr(md5(x),1,15),16,10)`) and DuckDB
    * (`('0x'||substr(md5(x),1,15))::BIGINT`) — used wherever an oracle
    * must reproduce hashing. For hot paths without an oracle
    * requirement, prefer `xxhash64` (cheaper, native). */
  def portableHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Sliding word k-grams ("shingles"). Native higher-order functions:
    * sequence + transform + element_at, no explode — the array stays
    * inside the row, so shingling is shuffle-free. */
  /** PERF: the token array is referenced k times per shingle inside the
    * lambda; if `toks` is an inline expression Catalyst re-evaluates the
    * full tokenization per element_at — O(shingles × doc_len) per row.
    * Always pass a MATERIALIZED token column (withColumn) here. */
  def wordShinglesFromTokens(toks: Column, k: Int): Column =
    // guard: Spark's sequence(1, 0) is DESCENDING [1, 0], not empty —
    // short docs must explicitly yield an empty shingle array
    when(size(toks) >= k,
      transform(
        sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<string>"))

  /** text → its word k-shingles as strings, every occurrence in order.
    * Backed by the native [[graft.plans.WordShingles]] pass (the
    * equivalent `wordShinglesFromTokens(tokens(text), k)` HOF chain is
    * ~100× slower per row; spec-pinned equal). */
  def wordShingles(text: Column, k: Int): Column = {
    import org.apache.spark.sql.graftshim.GraftShim
    GraftShim.column(graft.plans.WordShingles(GraftShim.expression(text), k))
  }

  /** text → distinct 60-bit portable hashes of its word k-shingles in
    * ONE native pass — the hot-path form of
    * `transform(wordShingles(text,k), portableHash)`. Backed by the
    * [[graft.plans.HashedWordShingles]] expression; see its scaladoc
    * for why the composable HOF chain is ~100× slower per row. */
  def hashedWordShingles(text: Column, k: Int): Column = {
    import org.apache.spark.sql.graftshim.GraftShim
    GraftShim.column(graft.plans.HashedWordShingles(GraftShim.expression(text), k))
  }

  /** text → SimHash signature in ONE native pass — the hot-path form
    * of `Dedup.simHashFromHashes(transform(tokens(text), hash), bits)`
    * (that HOF chain pays `numBits` interpreted passes per row). Backed
    * by [[graft.plans.SimHash64]]; bit-equality with the composable
    * formulation is spec-pinned for both hash modes. */
  def simHash(text: Column, numBits: Int = 64, portable: Boolean = false): Column = {
    import org.apache.spark.sql.graftshim.GraftShim
    GraftShim.column(graft.plans.SimHash64(GraftShim.expression(text), numBits, portable))
  }

  /** Text normalization for dedup-before-hash cleaning: lowercase,
    * strip punctuation/symbols (Unicode letter/number classes kept, so
    * non-Latin scripts survive), squish whitespace runs, trim. The
    * canonical pre-pass before fingerprint/minhash so formatting
    * variants collapse. */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^\\p{L}\\p{N} ]", " "), " +", " "))

  // ---- Unicode canonicalization (crawl-text first stage) ---------------

  /** Unicode NFC normalization (UAX #15 canonical composition) —
    * native codegen'd expression, ASCII fast path. The mandatory
    * pre-pass before any hash-based dedup: "é" and "e"+U+0301 are
    * different bytes for identical text. */
  def nfc(text: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftShim
    GraftShim.column(graft.plans.UnicodeNormalize(GraftShim.expression(text), "NFC"))
  }

  /** Unicode NFKC normalization (compatibility composition: ligatures,
    * fullwidth forms, circled digits → plain forms) — the aggressive
    * variant used before tokenization/language-ID. */
  def nfkc(text: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftShim
    GraftShim.column(graft.plans.UnicodeNormalize(GraftShim.expression(text), "NFKC"))
  }

  /** Repair UTF-8-as-cp1252 mojibake ("CafÃ©" → "Café", "â€™" → "’");
    * see [[graft.plans.FixMojibake]] for the accept conditions that
    * keep real Latin-1 prose untouched. */
  def fixMojibake(text: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftShim
    GraftShim.column(graft.plans.FixMojibake(GraftShim.expression(text)))
  }

  /** Strip/normalize the invisible-character debris of crawled text:
    * CRLF/CR → LF; C0 controls (except tab+newline), C1 controls,
    * zero-widths (ZWSP/ZWNJ/ZWJ/WJ/BOM) and soft hyphens removed;
    * NBSP + the Unicode space family → plain space. Pure codegen'd
    * regexp chain (same RE2-compatible patterns an oracle can mirror). */
  def cleanControls(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, "\\r\\n?", "\n"),
        "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F" +
          "\\x{0080}-\\x{009F}\\x{200B}-\\x{200D}\\x{2060}\\x{FEFF}\\x{00AD}]", ""),
      "[\\x{00A0}\\x{1680}\\x{2000}-\\x{200A}\\x{202F}\\x{205F}\\x{3000}]", " ")

  /** The composed canonical-text pass every corpus recipe runs first:
    * mojibake repair → NFC → control/zero-width cleanup → space-run
    * squish (newlines preserved) → trim. One narrow codegen'd
    * expression chain, fused with the scan. */
  def canonicalizeText(text: Column): Column =
    trim(regexp_replace(cleanControls(nfc(fixMojibake(text))), "[ \\t]+", " "))

  // ---- HTML → text -----------------------------------------------------

  /** Decode HTML character references (numeric + the common named set;
    * single left-to-right pass — `&amp;lt;` → `&lt;`, never
    * double-decoded). */
  def decodeHtmlEntities(text: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftShim
    GraftShim.column(graft.plans.DecodeHtmlEntities(GraftShim.expression(text)))
  }

  /** HTML → plain text (the boilerplate-light extraction stage of a
    * crawl pipeline): script/style bodies and comments dropped, block
    * tags become newlines, remaining tags become spaces, character
    * references decoded, whitespace canonicalized (space runs squished,
    * newlines trimmed, 3+ blank lines collapsed to one blank line).
    *
    * Every stage is a codegen'd `regexp_replace` with RE2-compatible
    * patterns (no backreferences, so an external engine can mirror the
    * chain) — fully narrow, fused with the scan at 100 TB.
    */
  def stripHtml(text: Column, decodeEntities: Boolean = true): Column = {
    val noScript = regexp_replace(text, "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val blocks = regexp_replace(noComment,
      "(?i)</?(?:p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|td|th|table|thead|tbody|" +
        "blockquote|section|article|header|footer|pre|hr|form|nav|aside)\\b[^>]*>", "\n")
    val noTag = regexp_replace(blocks, "<[^>]*>", " ")
    val decoded = if (decodeEntities) decodeHtmlEntities(noTag) else noTag
    val spaces = regexp_replace(decoded, "[ \\t]+", " ")
    val tidyNl = regexp_replace(spaces, " ?\\n ?", "\n")
    val capped = regexp_replace(tidyNl, "\\n{3,}", "\n\n")
    // trim() strips only spaces — edge newlines need the regex form
    regexp_replace(capped, "^\\s+|\\s+$", "")
  }

  /** Document fingerprint: md5 over the sorted distinct token set —
    * robust to token order and repetition (rolling-hash-style identity
    * for shuffle-dedup). */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  // ---- quality scoring -------------------------------------------------

  /** Expression-level LET BINDING: evaluate `value` ONCE per row and
    * feed every reference inside `f` from the bound lambda variable —
    * `transform` over a one-element array is the only pure-expression
    * binder the DSL offers. A Column expression tree has no sharing:
    * re-using a `val toks = tokens(text)` in k places evaluates the
    * whole tokenization k times per row (HOFs are CodegenFallback, so
    * no codegen subexpression elimination saves it either), and the
    * obvious withColumn materialization gets RE-INLINED when a filter
    * on the derived column pushes down (PushPredicateThroughNonJoin
    * substitutes aliases). The binding lives inside the expression, so
    * it survives pushdown; cost is one 1-element array per row.
    * Measured on langId (whose argmax tree re-embedded the 6 marker
    * scores in every branch): ~42 tokenization passes per row → 1. */
  private[graft] def let1(value: Column, f: Column => Column): Column =
    element_at(transform(array(value), f), 1)

  private val stopwordsEn = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for", "on")

  /** stopword hits / token count — prose has ~0.3-0.6, word salad ~0 */
  def stopwordRatio(text: Column): Column = let1(tokens(text), { toks =>
    val hits = size(filter(toks, t => t.isin(stopwordsEn.map(lit): _*)))
    when(size(toks) > 0, hits.cast("double") / size(toks)).otherwise(lit(0d))
  })

  /** non-alphanumeric, non-space chars / total chars */
  def punctRatio(text: Column): Column =
    let1(length(text), len =>
      when(len > 0,
        (len - length(regexp_replace(text, "[^a-zA-Z0-9 ]", "")))
          .cast("double") / len)
        .otherwise(lit(0d)))

  /** mean token length over an already-bound token array */
  private def meanWordLenOf(toks: Column): Column =
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t))
        .cast("double") / size(toks))
      .otherwise(lit(0d))

  def meanWordLen(text: Column): Column =
    let1(tokens(text), meanWordLenOf)

  /** Composite [0,1] quality score: length sweet-spot, low punctuation,
    * plausible word lengths. Deterministic double arithmetic. */
  def qualityScore(text: Column): Column = let1(tokens(text), { toks =>
    val lenScore = least(length(text).cast("double") / lit(500d), lit(1d))
    val punctScore = greatest(lit(1d) - punctRatio(text) * 5d, lit(0d))
    val wordScore = let1(meanWordLenOf(toks), m =>
      when(m.between(3d, 9d), lit(1d)).otherwise(lit(0.5d)))
    round((lenScore + punctScore + wordScore) / 3d, 6)
  })

  // ---- Gopher-style quality rules --------------------------------------

  /** The document-shape statistics behind the published Gopher/
    * MassiveText quality rules, as one narrow struct column:
    * word count, mean word length, hash-or-ellipsis symbol ratio,
    * fraction of lines starting with a bullet / ending with an
    * ellipsis, fraction of words with at least one alphabetic char.
    * All codegen'd string/array primitives — fused with the scan. */
  def gopherStats(text: Column): Column = let1(tokens(text), { toks =>
    let1(filter(split(text, "\n"), l => length(trim(l)) > 0), { lines =>
    val nWords = size(toks)
    val nLines = size(lines)
    val bulletStart = size(filter(lines, l =>
      trim(l).startsWith("-") || trim(l).startsWith("*") || trim(l).startsWith("•")))
    val ellipsisEnd = size(filter(lines, l => trim(l).endsWith("...") || trim(l).endsWith("…")))
    val symbolish = size(filter(toks, t => t.contains("#") || t.contains("...")))
    val alphaWords = size(filter(toks, t => t.rlike("[a-z]")))
    struct(
      nWords.cast("long").as("n_words"),
      round(meanWordLenOf(toks), 6).as("mean_word_len"),
      round(when(nWords > 0, symbolish.cast("double") / nWords).otherwise(0d), 6)
        .as("symbol_ratio"),
      round(when(nLines > 0, bulletStart.cast("double") / nLines).otherwise(0d), 6)
        .as("bullet_line_ratio"),
      round(when(nLines > 0, ellipsisEnd.cast("double") / nLines).otherwise(0d), 6)
        .as("ellipsis_line_ratio"),
      round(when(nWords > 0, alphaWords.cast("double") / nWords).otherwise(0d), 6)
        .as("alpha_word_ratio"))
    })
  })

  /** Keep rows passing the published Gopher thresholds (defaults from
    * the paper: 50–100k words, mean word length 3–10, <10% symbol
    * words, <90% bullet lines, <30% ellipsis lines, ≥80% words with an
    * alphabetic character). Narrow filter; pair with
    * `Repetition.dropRepetitive` for the full rule set. */
  def gopherFilter(
      df: org.apache.spark.sql.DataFrame, textCol: String,
      minWords: Long = 50L, maxWords: Long = 100000L,
      minMeanWordLen: Double = 3d, maxMeanWordLen: Double = 10d,
      maxSymbolRatio: Double = 0.1,
      maxBulletRatio: Double = 0.9,
      maxEllipsisRatio: Double = 0.3,
      minAlphaRatio: Double = 0.8): org.apache.spark.sql.DataFrame = {
    // bind the stats struct once: 8 getField references against one
    // evaluation (unbound, every threshold re-derived its field's whole
    // subtree — tokenization included — per row)
    df.filter(let1(gopherStats(df.col(textCol)), s =>
      s.getField("n_words").between(minWords, maxWords) &&
      s.getField("mean_word_len").between(minMeanWordLen, maxMeanWordLen) &&
      s.getField("symbol_ratio") <= maxSymbolRatio &&
      s.getField("bullet_line_ratio") <= maxBulletRatio &&
      s.getField("ellipsis_line_ratio") <= maxEllipsisRatio &&
      s.getField("alpha_word_ratio") >= minAlphaRatio))
  }

  // ---- PII redaction ---------------------------------------------------

  /** Redact common PII spans with typed tags: emails → `[EMAIL]`,
    * IPv4 addresses → `[IP]`, phone-ish digit runs → `[PHONE]`. Order
    * matters: emails first (their local part can contain digits),
    * then IPs (so a phone pattern can't swallow the octets), phones
    * last. Narrow, codegen'd, one row pass — the standard scrub stage
    * before training-data export. Regexes stay inside RE2's subset
    * (no lookarounds/backrefs) so an external SQL engine reproduces
    * them verbatim. */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]")
    val ip = regexp_replace(email,
      "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b", "[IP]")
    regexp_replace(ip,
      "\\+?\\d[\\d .()-]{7,}\\d", "[PHONE]")
  }

  // ---- line-level cleaning ---------------------------------------------

  /** Keep-predicate for one line of a document (RefinedWeb/CCNet-style
    * line-wise rules): the trimmed line must reach `minChars` characters
    * AND at least `minAlphaPct`% of its non-space characters must be
    * ASCII letters (drops separator runs, bare digit/punctuation lines,
    * nav crumbs like "— | —"). The ratio test is CROSS-MULTIPLIED
    * integer arithmetic (alpha*100 >= nonspace*pct) — no float division,
    * so external engines reproduce it bit-exactly.
    */
  private def lineKeep(l: Column, minChars: Int, minAlphaPct: Int): Column = {
    val t = trim(l)
    val alpha = length(regexp_replace(t, "[^A-Za-z]", ""))
    val nonspace = length(regexp_replace(t, " ", ""))
    (length(t) >= minChars) && (alpha * 100 >= nonspace * minAlphaPct)
  }

  /** Line-level document cleaning: split on '\n', drop lines failing
    * [[lineKeep]], re-join survivors. Pure higher-order column
    * expression — fully narrow, fused with the scan, no shuffle; the
    * standard boilerplate-line scrub that runs BEFORE paragraph/span
    * dedup in a web-corpus pipeline. Blank lines fail `minChars` and
    * are dropped (paragraph structure is flattened — run paragraph
    * dedup first if paragraph identity matters downstream).
    */
  def cleanLines(text: Column, minChars: Int = 3, minAlphaPct: Int = 40): Column =
    array_join(
      filter(split(text, "\n"), l => lineKeep(l, minChars, minAlphaPct)), "\n")

  /** [[cleanLines]] plus per-document accounting: cleaned text, lines
    * kept, lines dropped — the counts a pipeline uses to quarantine
    * documents that lost most of their content to the line rules. */
  def lineCleanReport(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      minChars: Int = 3,
      minAlphaPct: Int = 40): org.apache.spark.sql.DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, l => lineKeep(l, minChars, minAlphaPct))
    df.withColumn("clean_text", array_join(kept, "\n"))
      .withColumn("n_lines_kept", size(kept).cast("long"))
      .withColumn("n_lines_dropped", (size(lines) - size(kept)).cast("long"))
  }

  // ---- URL / domain filtering ------------------------------------------

  /** URL → lowercased host: optional scheme, optional userinfo, host up
    * to the first `/:?#`. RE2-subset regex (no lookarounds) so external
    * engines reproduce it verbatim. Bare domains ("example.com/x")
    * work too. */
  /** URL canonicalization — the dedup key for crawl URLs (RFC 3986 §6
    * syntax-based normalization + the tracking-parameter conventions
    * crawl pipelines add). Deterministic column math, no UDF:
    *
    *  1. fragment dropped;
    *  2. scheme and host lowercased (userinfo, path, query untouched);
    *  3. default ports removed (`:80` for http, `:443` for https);
    *  4. duplicate slashes in the path collapsed; empty path over an
    *     authority becomes `/` (RFC 3986 §6.2.3);
    *  5. query: tracking params dropped (`utm_*`, `fbclid`, `gclid`,
    *     `msclkid`, `ref`), empty pairs dropped, survivors SORTED (the
    *     order-insensitive canonical form); an emptied query loses its
    *     `?`.
    *
    * Inputs without `://` pass through unchanged (not a URL — don't
    * guess). Pair with [[registeredDomain]] for host-level policy and
    * `Dedup.exactDedup` on the canonical string for URL dedup. */
  def canonicalizeUrl(url: Column): Column = {
    val hasScheme = url.contains("://")
    val noFrag = substring_index(url, "#", 1)
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val afterScheme = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val authority = regexp_extract(afterScheme, "^([^/?]*)", 1)
    val pathQuery = regexp_replace(afterScheme, "^[^/?]*", "")
    // userinfo (anything up to '@') is case-SENSITIVE per RFC — only
    // the host part lowercases
    val userinfo = regexp_extract(authority, "^([^@]*@)", 1)
    val hostPort = regexp_replace(authority, "^[^@]*@", "")
    val hostLower = lower(hostPort)
    val host = concat(userinfo,
      when(scheme === "http", regexp_replace(hostLower, ":80$", ""))
        .when(scheme === "https", regexp_replace(hostLower, ":443$", ""))
        .otherwise(hostLower))
    val rawPath = regexp_extract(pathQuery, "^([^?]*)", 1)
    val path = when(length(rawPath) === 0, lit("/"))
      .otherwise(regexp_replace(rawPath, "/{2,}", "/"))
    val rawQuery = when(pathQuery.contains("?"),
      regexp_replace(pathQuery, "^[^?]*\\?", "")).otherwise(lit(""))
    val keptParams = array_sort(filter(split(rawQuery, "&"), p =>
      length(p) > 0 &&
        !p.rlike("^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref)=")))
    val query = array_join(keptParams, "&")
    val canon = concat(scheme, lit("://"), host, path,
      when(length(query) > 0, concat(lit("?"), query)).otherwise(lit("")))
    when(hasScheme, canon).otherwise(url)
  }

  def extractDomain(url: Column): Column =
    lower(regexp_extract(url,
      "^(?:[A-Za-z][A-Za-z0-9+.-]*://)?(?:[^/?#@]*@)?([^/:?#]+)", 1))

  /** host → all dot-suffixes, most-specific first:
    * `a.b.com → [a.b.com, b.com, com]` — the shape that turns
    * "blocklisted domain matches subdomains" into an exact set overlap
    * instead of an endsWith theta join. Narrow HOFs. */
  def domainSuffixes(host: Column): Column = {
    val parts = split(host, "\\.")
    transform(
      sequence(lit(1), size(parts)),
      i => array_join(slice(parts, i, size(parts)), "."))
  }

  /** Misra–Gries heavy-hitters aggregate over a text column (native
    * [[graft.plans.FrequentTerms]]): at most `k` (term, counter) pairs
    * per partition, mergeable summaries through the final aggregation —
    * no token explode, no term shuffle. Returns
    * `array<struct<term, est>>` sorted (est desc, term asc), with the
    * MG guarantee `true − n/(k+1) ≤ est ≤ true`. The bounded-state
    * complement of [[termDocFreq]] for whole-corpus vocabulary. */
  def frequentTerms(text: Column, k: Int): Column = {
    import org.apache.spark.sql.graftshim.GraftShim
    GraftShim.column(
      graft.plans.FrequentTerms(GraftShim.expression(text), k).toAggregateExpression())
  }

  /** Public-suffix rule set (publicsuffix.org semantics): `normal`
    * rules match literally, `wildcardBases` are the `x` of `*.x` rules
    * (one arbitrary label + base is the public suffix), `exceptions`
    * are `!rule` entries (the matched host's public suffix is the rule
    * MINUS its leftmost label, overriding everything). Rules are
    * lowercase label sequences without the `*.`/`!` markers. */
  final case class PslRules(
      normal: Seq[String],
      wildcardBases: Seq[String],
      exceptions: Seq[String]) {
    def all: Seq[String] = normal ++ wildcardBases ++ exceptions
  }

  object PslRules {
    /** Parse standard public_suffix_list.dat lines (comments `//`,
      * blanks, `*.` wildcards, `!` exceptions). Load the real list with
      * `spark.read.textFile(path).collect()` and pass it here — the
      * full PSL is ~9k rules, well inside literal-array size. */
    def parse(lines: Seq[String]): PslRules = {
      val rules = lines.map(_.trim.toLowerCase)
        .filter(l => l.nonEmpty && !l.startsWith("//"))
        .map(_.takeWhile(!_.isWhitespace))
      PslRules(
        normal = rules.filter(r => !r.startsWith("*.") && !r.startsWith("!")),
        wildcardBases = rules.filter(_.startsWith("*.")).map(_.drop(2)),
        exceptions = rules.filter(_.startsWith("!")).map(_.drop(1)))
    }

    /** Vendored SUBSET of the public suffix list (no egress in this
      * build env): the common multi-label registry suffixes plus the
      * canonical wildcard/exception family. Single-label TLDs need no
      * entry — the PSL default `*` rule covers them. Swap in the full
      * list via [[parse]] for production. */
    val builtin: PslRules = PslRules(
      normal = Seq(
        "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
        "com.au", "net.au", "org.au", "edu.au", "gov.au",
        "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
        "co.kr", "or.kr", "com.br", "net.br", "org.br",
        "com.cn", "net.cn", "org.cn", "com.mx", "co.in", "net.in",
        "co.nz", "org.nz", "net.nz", "com.sg", "com.tr", "co.za",
        "com.ar", "com.co", "co.il", "com.hk", "com.tw", "com.my",
        "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
        "s3.amazonaws.com", "cloudfront.net", "azurewebsites.net",
        "web.app", "firebaseapp.com", "netlify.app", "vercel.app"),
      wildcardBases = Seq("ck", "er", "np", "kh", "fj", "pg"),
      exceptions = Seq("www.ck"))
  }

  /** The host's PUBLIC SUFFIX under `rules` (publicsuffix.org
    * algorithm: exceptions override; otherwise the matching rule with
    * the most labels wins; otherwise the default `*` rule — the
    * rightmost label). Pure narrow Column logic over the dot-suffix
    * array: rule sets become literal arrays, matching is array_contains
    * over at most label-count probes — no join, no shuffle, codegen'd.
    */
  def publicSuffix(host: Column, rules: PslRules = PslRules.builtin): Column =
    psPos(host, rules)._2

  /** position of the public suffix in the host's suffix array + the
    * suffix itself (shared by publicSuffix/registeredDomain) */
  private def psPos(host: Column, rules: PslRules): (Column, Column) = {
    val sufs = domainSuffixes(host)
    val n = size(sufs)
    val idx = sequence(lit(1), n)
    def litArr(xs: Seq[String]) = array(xs.map(x => lit(x)): _*)
    def minMatch(set: Seq[String], minI: Int): Column =
      if (set.isEmpty) lit(null).cast("int")
      else array_min(filter(idx,
        i => i >= minI && array_contains(litArr(set), element_at(sufs, i))))
    val normPos = minMatch(rules.normal, 1)
    // wildcard *.b: the public suffix is <label>.b — one position left
    // of the matched base, which must have a label before it
    val wildPos = minMatch(rules.wildcardBases, 2) - 1
    // exception !e: public suffix is e minus its leftmost label — one
    // position right of the match (guard: must still exist)
    val excRaw = minMatch(rules.exceptions, 1) + 1
    val excPos = when(excRaw <= n, excRaw)
    val pos = coalesce(excPos, least(normPos, wildPos), n)
    (pos, element_at(sufs, pos))
  }

  /** eTLD+1: the registered (registrable) domain of a URL — public
    * suffix plus one label; NULL when the host IS a public suffix (or
    * empty). The real per-registry semantics blocklists and per-site
    * aggregations need: `sub.shop.example.co.uk → example.co.uk`,
    * `foo.github.io → foo.github.io`'s owner page stays distinct from
    * `github.io`. Narrow, no shuffle. */
  def registeredDomain(url: Column, rules: PslRules = PslRules.builtin): Column = {
    val host = extractDomain(url)
    val sufs = domainSuffixes(host)
    val (pos, _) = psPos(host, rules)
    when(pos >= 2, element_at(sufs, pos - 1))
  }

  /** Drop rows whose URL's domain (or any parent domain) is in a SMALL
    * static blocklist — a narrow codegen'd `arrays_overlap` filter
    * fused into the scan; zero shuffles, the UT1-blocklist-style scrub
    * for a bounded list. For a large blocklist TABLE use
    * [[dropBlockedDomainsTable]]. */
  def dropBlockedDomains(df: org.apache.spark.sql.DataFrame, urlCol: String,
      blocked: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(blocked.nonEmpty, "empty blocklist — nothing to drop")
    val sufs = domainSuffixes(extractDomain(df.col(urlCol)))
    df.filter(!arrays_overlap(sufs,
      array(blocked.map(b => lit(b.toLowerCase)): _*)))
  }

  /** One regex alternation over an escaped, ASCII word/phrase blocklist
    * — the C4-style "bad words" document filter's matcher. Word-boundary
    * semantics (`\b…\b`, ASCII `\w` in BOTH java.util.regex and RE2, so
    * an external engine mirrors it verbatim), case-insensitive;
    * multi-word phrases match across single spaces. Regex metachars in
    * terms are escaped, so the list is data, not pattern syntax. */
  private def blockedTermPattern(terms: Seq[String]): String = {
    require(terms.nonEmpty, "empty term blocklist — nothing to match")
    terms.foreach(t => require(t.trim.nonEmpty, "blank blocklist term"))
    val escaped = terms.map(_.trim.toLowerCase
      .replaceAll("""([\\.\[\]{}()*+?^$|\-])""", """\\$1""")
      .replaceAll(" +", " "))
    s"(?i)\\b(${escaped.mkString("|")})\\b"
  }

  /** TRUE iff the text contains any blocklisted word/phrase at word
    * boundaries — narrow, codegen'd, fused with the scan. */
  def containsBlockedTerm(text: Column, terms: Seq[String]): Column =
    text.rlike(blockedTermPattern(terms))

  /** the first blocklisted term that matches, lowercased ('' if none) —
    * the audit column a filtering report wants beside the drop */
  def firstBlockedTerm(text: Column, terms: Seq[String]): Column =
    lower(regexp_extract(text, blockedTermPattern(terms), 1))

  /** C4-style bad-words document filter: drop every document containing
    * any listed word/phrase (word-boundary, case-insensitive). The
    * standard list is a few hundred terms — one codegen'd `rlike` per
    * row, zero shuffles. (A blocklist of many thousands of terms wants
    * an automaton instead of an alternation; this surface is for the
    * published bounded lists.) */
  def dropBlockedTerms(df: org.apache.spark.sql.DataFrame, textCol: String,
      terms: Seq[String]): org.apache.spark.sql.DataFrame =
    df.filter(!containsBlockedTerm(df.col(textCol), terms))

  /** Bad-words blocklist as a DataFrame (one `term` column) for lists
    * too big for a regex alternation — the scale path: per doc the
    * DISTINCT punctuation-stripped lowercase tokens explode (bounded by
    * vocabulary, not length), semi-join the term list to find blocked
    * ids, anti-join those out. Two equi joins the optimizer broadcasts
    * when the list fits and hash-shuffles when it doesn't — never a
    * per-row scan of the whole list. SINGLE-WORD terms only (token
    * semantics: whitespace split, then leading/trailing ASCII
    * punctuation stripped — "spam." matches "spam"); multi-word
    * phrases need the regex surface [[dropBlockedTerms]]. */
  def dropBlockedTermsTable(df: org.apache.spark.sql.DataFrame, textCol: String,
      idCol: String,
      blocklist: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val toks = array_distinct(transform(tokens(df.col(textCol)),
      t => regexp_replace(t, """^[\p{Punct}]+|[\p{Punct}]+$""", "")))
    val blockedIds = df
      .select(df.col(idCol), explode(toks).as("__tok"))
      .join(blocklist.select(lower(trim(col("term"))).as("__tok")), Seq("__tok"), "left_semi")
      .select(idCol)
      .distinct()
    df.join(blockedIds, Seq(idCol), "left_anti")
  }

  /** Blocklist as a DataFrame (one `domain` column) for lists too big
    * to inline: explode each row's domain suffixes (bounded by label
    * count, ~5), semi-join the suffixes against the list to find
    * blocked ids, anti-join those out — two equi joins the optimizer
    * broadcasts when the list fits and hash-shuffles when it doesn't.
    */
  def dropBlockedDomainsTable(df: org.apache.spark.sql.DataFrame, urlCol: String,
      idCol: String,
      blocklist: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val blockedIds = df
      .select(df.col(idCol),
        explode(domainSuffixes(extractDomain(df.col(urlCol)))).as("__suf"))
      .join(blocklist.select(lower(col("domain")).as("__suf")), Seq("__suf"), "left_semi")
      .select(idCol)
      .distinct()
    df.join(blockedIds, Seq(idCol), "left_anti")
  }

  // ---- corpus statistics -----------------------------------------------

  /** Term → document-frequency table: in how many documents does each
    * token appear (the DF half of TF-IDF, the standard vocabulary
    * artifact for corpus filtering). Per-row distinct-token explode,
    * then ONE count shuffle on the term — no doc_id in the wide stage,
    * so the shuffled payload is just terms. */
  def termDocFreq(df: org.apache.spark.sql.DataFrame, textCol: String): org.apache.spark.sql.DataFrame =
    df.select(explode(array_distinct(tokens(df.col(textCol)))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("doc_freq"))

  /** Top-k characteristic terms per document by tf-idf. The idf is the
    * RATIONAL form (N+1)/(df+1) rather than its logarithm: same
    * per-term ranking (log is monotone), but every score stays exact
    * integer-derived double arithmetic — bit-identical across engines,
    * so the scores themselves can be oracle-gated (ln's last-ulp
    * behavior is libm-dependent). Shape: two narrow explodes, a
    * term-keyed broadcast-friendly join (the vocabulary is tiny next to
    * the corpus), one per-doc window. Eager in N (one count action).
    *
    * @return (idCol, term, score round 6) — k rows per doc, ties broken
    *         by term asc */
  def tfidfTopTerms(
      df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val n = df.count()
    val toks = df.select(df.col(idCol), tokens(df.col(textCol)).as("__tk"))
    val tf = toks.select(col(idCol), explode(col("__tk")).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("__tf"))
    val dfreq = toks.select(explode(array_distinct(col("__tk"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("__df"))
    val rawScore = col("__tf").cast("double") * lit((n + 1).toDouble) / (col("__df") + 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(rawScore.desc, col("term").asc)
    tf.join(dfreq, Seq("term"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col(idCol), col("term"), round(rawScore, 6).as("score"))
  }

  // ---- keyword retrieval (BM25) ----------------------------------------

  /** BM25 top-k keyword retrieval (k1 = 1.2, b = 3/4) with the RATIONAL
    * idf `(N - df + 1/2)/(df + 1/2)` instead of its logarithm — the
    * same per-term document ranking (log is monotone), but the whole
    * score stays exact integer arithmetic so results are bit-identical
    * across engines and the scores themselves can be oracle-gated
    * (`ln`'s last-ulp behavior is libm-dependent). Same trade
    * [[tfidfTopTerms]] makes.
    *
    * Each term contribution for tf > 0 reduces to the integer ratio
    * {{{
    *   P / Q = 22·tf·T·(2N − 2df + 1)
    *         / [(2df + 1)·(10·tf·T + 3·T + 9·dl·N)]
    * }}}
    * (N docs, T corpus tokens, dl doc length; k1 = 6/5, b = 3/4 cleared
    * of denominators), computed in DECIMAL(38,0) and rounded half-up to
    * 6 dp as `(2·P·10⁶ + Q) div (2·Q)` — one exact integral divide per
    * term, summed in BIGINT micro-units. Headroom: 2·P·10⁶ fits
    * DECIMAL(38,0) through tf·T·N ≈ 4·10²⁹ (e.g. 10⁵ tf × 2·10¹³
    * corpus tokens × 10¹¹ docs); the `score` double rendering is exact
    * while the micro-unit sum stays below 2⁵³.
    *
    * Shape for 100 TB: ONE corpus-stats pass (count + token total +
    * per-term df in a single partial/final aggregate) broadcast back as
    * a one-row frame, then a fully narrow scoring pass — per-term tf is
    * a codegen'd array filter, no explode, no term shuffle. Top-k is
    * TakeOrdered (no global sort).
    *
    * @return (idCol, score) — k best-matching docs, score desc, ties by
    *         id asc; only docs matching ≥1 term are candidates
    */
  def bm25TopK(
      df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int): org.apache.spark.sql.DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val toks = df.select(df.col(idCol), tokens(df.col(textCol)).as("__tk"))
      .withColumn("__dl", size(col("__tk")).cast("long"))
    val statAggs =
      (sum(col("__dl")).as("__t") +:
        terms.zipWithIndex.map { case (t, i) =>
          sum(when(array_contains(col("__tk"), lit(t)), 1L).otherwise(0L))
            .as(s"__df_$i")
        }).toSeq
    val stats = toks.agg(count(lit(1)).as("__n"), statAggs: _*)
    val withPq = terms.indices.foldLeft(toks.crossJoin(broadcast(stats))) {
      case (acc, i) =>
        val t = terms(i)
        val tf = size(filter(col("__tk"), x => x === lit(t))).cast("long")
        acc
          .withColumn(s"__tf_$i", tf)
          .withColumn(s"__p_$i",
            expr(s"CAST(22 AS DECIMAL(38,0)) * __tf_$i * __t * (2 * __n - 2 * __df_$i + 1)"))
          .withColumn(s"__q_$i",
            expr(s"CAST(2 AS DECIMAL(38,0)) * __df_$i + 1") *
              expr(s"CAST(10 AS DECIMAL(38,0)) * __tf_$i * __t + 3 * __t + 9 * __dl * __n"))
    }
    val c6 = terms.indices
      .map(i => expr(
        s"CASE WHEN __tf_$i > 0 THEN (2 * __p_$i * 1000000 + __q_$i) div (2 * __q_$i) ELSE 0L END"))
      .reduce(_ + _)
    withPq
      .withColumn("__score6", c6)
      .filter(col("__score6") > 0)
      .orderBy(col("__score6").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol),
        (col("__score6").cast("double") / lit(1000000.0)).as("score"))
  }

  // ---- hashed-bag linear classifier scoring ------------------------------

  /** Token → feature bucket: portable 60-bit md5 hash (same family as
    * `Sampling.unitHashInt`, mirror `('0x'||substr(md5(seed||chr(1)||t),
    * 1,15))::BIGINT % n`) mod `nBuckets`. Usable inside HOF lambdas. */
  def tokenBucket(t: Column, nBuckets: Int, seed: String): Column =
    pmod(conv(substring(md5(concat(lit(seed), lit("\u0001"), t)), 1, 15), 16, 10)
      .cast("long"), lit(nBuckets.toLong)).cast("int")

  /** fastText-style linear text-classifier scoring over a hashed
    * bag-of-tokens (the quality-classifier shape of CCNet/FineWeb-class
    * pipelines): each token hashes to one of `nBuckets` features, the
    * model is a weight per bucket in integer MICRO-units (weight·10⁶ as
    * BIGINT — training happens elsewhere; this is distributed inference),
    * and a document's logit is mean-pooled `(Σ w[bucket(tok)])/n_tokens
    * + bias`.
    *
    * Exactness: the weight sum and `biasMicro·n_tokens` stay BIGINT, so
    * the logit is ONE IEEE division of exact integers —
    * `(S + bias·dl) / (dl·10⁶)` — deterministic across engines and
    * hash-gateable (double SUMS are order-dependent; a single division
    * of exact operands is not).
    *
    * Shape for 100 TB: the weight table collapses to a one-row map
    * (`map_from_entries`) broadcast to every executor — bounded by
    * `nBuckets` entries (a 2²⁰-bucket model is ~16 MB) — and scoring is
    * a fully narrow codegen'd `aggregate` HOF over the token array: no
    * explode, no join, no shuffle; fuses with the scan. Missing buckets
    * weigh 0. Empty docs score NULL (no evidence).
    *
    * @param weights (bucket INT, weight_micro BIGINT) model table
    * @return df + (n_tokens BIGINT, logit DOUBLE)
    */
  /** one-row DENSE weight array (index = bucket + 1) from a (bucket,
    * micro) table. element_at on an ARRAY is O(1) GetArrayItem; a
    * MapType `element_at` is a LINEAR scan of all nBuckets entries per
    * token (ArrayBasedMapData has no hash index) — the O(nBuckets) map
    * walk happens once here instead of once per token. */
  private[graft] def denseWeightRow(
      weights: org.apache.spark.sql.DataFrame,
      nBuckets: Int): org.apache.spark.sql.DataFrame =
    weights
      .agg(map_from_entries(collect_list(struct(
        col(weights.columns.head).cast("int").as("k"),
        col(weights.columns(1)).cast("long").as("v")))).as("__wm"))
      .select(transform(sequence(lit(0), lit(nBuckets - 1)),
        i => coalesce(element_at(col("__wm"), i.cast("int")), lit(0L))).as("__wa"))

  def linearTextScore(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      weights: org.apache.spark.sql.DataFrame,
      nBuckets: Int,
      seed: String = "cls",
      biasMicro: Long = 0L): org.apache.spark.sql.DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    df.crossJoin(broadcast(denseWeightRow(weights, nBuckets)))
      .withColumn("__bk", tokenBucketStream(col(textCol), nBuckets, seed))
      .withColumn("n_tokens", size(col("__bk")).cast("long"))
      .withColumn("logit",
        when(col("n_tokens") > 0,
          (aggregate(col("__bk"), lit(0L),
            (acc, b) => acc + element_at(col("__wa"), b + 1)) +
            lit(biasMicro) * col("n_tokens")).cast("double") /
            (col("n_tokens") * lit(1000000L)).cast("double")))
      .drop("__wa", "__bk")
  }

  /** per-token bucket stream via the native kernel (one loop per row;
    * the interpreted per-token md5 chain dominated scoring cost) —
    * bucket contract identical to [[tokenBucket]] */
  private[graft] def tokenBucketStream(
      text: Column, nBuckets: Int, seed: String): Column = {
    import org.apache.spark.sql.graftshim.GraftShim
    GraftShim.column(graft.plans.HashedNgramBuckets(
      GraftShim.expression(text), nBuckets, seed, None))
  }

  /** Corpus filtered by the linear classifier: keeps docs whose logit
    * is at least `minLogitMicro`·10⁻⁶. The threshold test is the exact
    * BIGINT cross-compare `S + bias·dl ≥ minLogitMicro·dl` — no double
    * in the decision. Empty docs are KEPT (no evidence), matching
    * [[graft.operators.Repetition.dropRepetitive]]. */
  def filterByLinearScore(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      weights: org.apache.spark.sql.DataFrame,
      nBuckets: Int,
      minLogitMicro: Long,
      seed: String = "cls",
      biasMicro: Long = 0L): org.apache.spark.sql.DataFrame = {
    val bk = tokenBucketStream(col(textCol), nBuckets, seed)
    val s = aggregate(bk, lit(0L),
      (acc, b) => acc + element_at(col("__wa"), b + 1))
    val dl = size(bk).cast("long")
    df.crossJoin(broadcast(denseWeightRow(weights, nBuckets)))
      .filter(dl === 0L ||
        s + lit(biasMicro) * dl >= lit(minLogitMicro) * dl)
      .drop("__wa")
  }

  // ---- language identification ----------------------------------------

  /** marker words per language (tiny n-gram heuristic; deterministic) */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "es" -> Seq("el", "la", "de", "que"),
    "fr" -> Seq("le", "la", "et", "les"),
    "de" -> Seq("der", "die", "und", "das"),
    "zh" -> Seq("de", "shi", "le", "zai"))

  /** Predicted language = argmax of marker-word hit counts (first wins
    * ties, 'und' = undetermined when no marker hits). Round 12: the
    * tokenization and the per-language scores are let1-bound — the
    * naive argmax tree re-embedded `best` (itself all six scores) in
    * every branch, costing ~42 tokenization passes per row; now one
    * tokenization + one marker pass per language, with the argmax
    * reading the bound score array. Values identical by construction
    * (same subexpressions, evaluated once). */
  def langId(text: Column): Column = let1(tokens(text), { toks =>
    val ms = langMarkers.toSeq
    let1(array(ms.map { case (_, markers) =>
        size(filter(toks, t => t.isin(markers.map(lit): _*)))
      }: _*), { scores =>
      // array_max ≡ the old greatest(...) here: all six elements share
      // null-ness (all derived from the same token array)
      val best = array_max(scores)
      ms.map(_._1).zipWithIndex.foldRight(lit("und")) {
        case ((lang, i), acc) =>
          when(element_at(scores, i + 1) === best && best > 0, lit(lang))
            .otherwise(acc)
      }
    })
  })

  // ---- writing-system (script) analysis --------------------------------

  /** the major Unicode scripts profiled, in tie-break priority order;
    * Java spells the property `\p{IsXxx}`, RE2 `\p{Xxx}` — same
    * Scripts.txt repertoire, so an external engine mirrors the counts
    * verbatim (modulo Unicode-version drift on recently-added chars) */
  val ProfiledScripts: Seq[String] = Seq(
    "Latin", "Cyrillic", "Han", "Arabic", "Devanagari", "Hangul",
    "Hiragana", "Katakana", "Greek", "Hebrew", "Thai")

  /** per-script CODE-POINT counts as a struct (field = lowercased
    * script name) plus `total` (sum over profiled scripts) — the
    * writing-system complement of [[langId]]: script mix is the signal
    * language markers can't see (wrong-script spam, mixed-script
    * injection, transliteration residue). Narrow codegen'd
    * `regexp_count` per script, fused with the scan. */
  def scriptCounts(text: Column): Column = {
    val counts = ProfiledScripts.map(s =>
      regexp_count(text, lit(s"\\p{Is$s}")).cast("long").as(s.toLowerCase))
    struct((counts :+
      counts.map(c => c.cast("long")).reduce(_ + _).as("total")): _*)
  }

  /** dominant script name (lowercase; '''und''' when no profiled-script
    * char occurs) — ties break by [[ProfiledScripts]] order, so the
    * answer is engine-deterministic */
  def dominantScript(text: Column): Column = {
    val counts = ProfiledScripts.map(s =>
      s.toLowerCase -> regexp_count(text, lit(s"\\p{Is$s}")).cast("long"))
    val best = counts.map(_._2).reduce(greatest(_, _))
    counts.foldRight(lit("und")) { case ((name, c), acc) =>
      when(c === best && best > 0, lit(name)).otherwise(acc)
    }
  }

  /** script-mix score in exact micro-units: `1 − dominant/total` over
    * profiled-script chars, as round-half-up((total−max)/total · 10^6)
    * in pure BIGINT — 0 for single-script text, → 1 for an even mix;
    * 0 when no profiled chars (no evidence). The wrong-script /
    * injected-script spam signal. */
  def scriptMixMicro(text: Column): Column = {
    val counts = ProfiledScripts.map(s =>
      regexp_count(text, lit(s"\\p{Is$s}")).cast("long"))
    val total = counts.reduce(_ + _)
    val mx = counts.reduce(greatest(_, _))
    val num = (total - mx) * lit(2000000L) + total
    val den = total * lit(2L)
    // exact BIGINT floor division: subtract the remainder first, then
    // ONE IEEE divide of an exact multiple (≤ 2e13 ≪ 2^53 — exact);
    // a bare `/` would be double division, a DECIMAL `/` rounds
    when(total > 0, ((num - pmod(num, den)) / den).cast("long"))
      .otherwise(lit(0L))
  }
}

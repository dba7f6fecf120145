package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline surface:
  * tokenization, engine-portable hashing, quality metrics, language-ID
  * scoring, document fingerprints. All pure column expressions.
  */
object TextFunctions {
  /** Whitespace tokens; leading/trailing space safe; no empty tokens. */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword segmentation: letter runs, digit runs, single
    * punctuation marks. */
  def subtokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** Overlapping character n-grams (step 1) — the fastText-style
    * language-ID feature; a text shorter than `n` collapses to one
    * whole-string gram so no row loses its feature spine. Character
    * (not byte) indexed, so multi-byte scripts gram identically across
    * engines. */
  def charNgrams(text: Column, n: Int): Column =
    when(length(text) < n, array(text))
      .otherwise(transform(sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))

  /** 32-bit token hash derived from the first 8 hex chars of sha256 —
    * chosen over xxhash64 because any engine (the DuckDB oracle included)
    * reproduces it bit-for-bit. Use [[fastHash]] in paths that don't need
    * cross-engine parity. */
  def shaHash32(c: Column): Column =
    conv(substring(sha2(c, 256), 1, 8), 16, 10).cast("long")

  /** 64-bit cross-engine token hash from sha256 hex chars 1–16: the full
    * 16-char slice can exceed BIGINT range, so the value is assembled
    * from two 32-bit halves as signed(hi)·2^32 + lo — pure arithmetic
    * (no unsigned types, no 64-bit shifts), which any oracle engine
    * replays exactly: both factors stay inside signed-64 range at every
    * step (hi' ∈ [-2^31, 2^31), so hi'·2^32 + lo ∈ [-2^63, 2^63-1]).
    * This is the GATE-CHECKABLE twin of xxhash64 for 64-bit SimHash;
    * use [[fastHash]]/xxhash64 where cross-engine parity isn't needed. */
  def shaHash64(c: Column): Column = {
    val hex = sha2(c, 256)
    val hi = conv(substring(hex, 1, 8), 16, 10).cast("long")
    val lo = conv(substring(hex, 9, 8), 16, 10).cast("long")
    when(hi >= 2147483648L, hi - 4294967296L).otherwise(hi) * 4294967296L + lo
  }

  /** Cheap non-cryptographic hash for engine-internal paths (MinHash
    * permutations, LSH banding). */
  def fastHash(c: Column, seed: Int): Column = xxhash64(lit(seed), c)

  /** Word n-grams over a token array; documents shorter than n collapse
    * to a single whole-text shingle so no row ever drops out. */
  def wordNgrams(toks: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))
    when(size(toks) < n, array(concat_ws(" ", toks))).otherwise(grams)
  }

  // ------------------------------------------------------------------ PII
  // Detection/redaction patterns, deliberately restricted to syntax that
  // Java regex and RE2 (the DuckDB oracle) interpret identically: char
  // classes, bounded repetition, non-capturing groups, ASCII \b — no
  // lookaround, no backreferences.
  /** RFC-casual email address. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** Dotted-quad IPv4 literal. */
  val Ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  /** US-local 7-digit phone shape (NNN-NNNN). Matched AFTER emails and
    * IPs are masked, so digit runs inside those never count twice. */
  val PhoneRe = "\\b[0-9]{3}-[0-9]{4}\\b"

  /** Occurrences of `re` in `text` (0 when none). */
  def countMatches(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  /** Mask emails, then IPv4s, then phone shapes — in that order, so the
    * narrower numeric patterns never bite fragments of an address that
    * a wider pattern already owns. Pure codegen'd expressions: this is
    * a scan-stage rewrite at 100 TB, not a UDF. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Unicode NFC normalization via graft's native codegen'd expression
    * (requires [[graft.GraftExtensions]] on the session). */
  def nfc(text: Column): Column = call_function("nfc_normalize", text)

  // ----------------------------------------------------------------- HTML
  // Web-corpus text extraction — the stage every pretraining pipeline
  // runs between fetch and quality filtering. Same portability contract
  // as redactPii: staged global regexps restricted to syntax Java regex
  // and RE2 read identically ((?is) inline flags, lazy quantifiers,
  // char classes — no lookaround), so the whole extraction is
  // scan-stage codegen at 100 TB and an oracle engine can replay it.

  /** Decode the six entities that matter for token statistics. Ordering
    * is load-bearing: `&amp;` decodes LAST so `&amp;lt;` becomes the
    * literal `&lt;` (single decode, never double). */
  def decodeEntities(t: Column): Column = {
    val steps = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    // entity names contain no regex metacharacters, so the patterns are
    // literal in Java regex AND RE2 alike (no \Q..\E needed)
    steps.foldLeft(t) { case (c, (from, to)) => regexp_replace(c, from, to) }
  }

  /** HTML → text: drop script/style SUBTREES (content and all), then
    * comments, then every remaining tag, decode entities, collapse
    * whitespace. Regexp-staged boilerplate removal, not a DOM parse —
    * the trafilatura-lite tradeoff every crawl pipeline makes when the
    * corpus is too big to parse. */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]+>", " ")
    trim(regexp_replace(decodeEntities(noTags), "\\s+", " "))
  }

  /** href attribute values (double-quoted form, attribute name
    * case-insensitive) in document order — the outlink side of a crawl
    * frontier / link-graph build; feed through [[canonicalizeUrl]]
    * before keying. */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html, lit("(?i)href\\s*=\\s*\"([^\"]*)\""), lit(1))

  /** Anchor elements as (href, text) structs in document order — the
    * anchor-text harvest of a link-graph build: the text OTHER pages use
    * when linking to a target is a description of the target written by
    * a third party, the classic web-corpus augmentation signal. Element
    * scoping first (the whole `<a ...>...</a>` span), then per-element
    * href + inner-text extraction, so a page's second anchor can never
    * borrow its first anchor's href. Inner text goes through the same
    * tag-strip / entity-decode / whitespace-collapse stages as
    * [[stripHtml]]. All RE2-portable global regexps — scan-stage, no
    * shuffle. */
  def extractAnchors(html: Column): Column = {
    val els = regexp_extract_all(html,
      lit("(?is)<a\\s[^>]*href\\s*=\\s*\"[^\"]*\"[^>]*>.*?</a>"), lit(0))
    transform(els, e => struct(
      regexp_extract(e, "(?i)href\\s*=\\s*\"([^\"]*)\"", 1).as("href"),
      trim(regexp_replace(decodeEntities(
        regexp_replace(e, "(?s)<[^>]+>", " ")), "\\s+", " ")).as("text")))
  }

  /** Canonical URL for dedup keying — the standard web-corpus cleanup:
    * lowercase scheme+authority, strip the fragment, strip default ports
    * (http:80 / https:443), drop tracking params (utm_*, fbclid, gclid,
    * msclkid) and tidy the leftover separators. Staged RE2-portable
    * regexps (no lookaround, global), same portability contract as
    * [[redactPii]]: URL-keyed exact dedup at 100 TB is a scan-stage
    * rewrite, and the oracle engine must be able to replay every stage.
    * Deliberately NOT touched: query-param order (reordering changes
    * semantics for some sites) and percent-encoding (decode belongs to a
    * fetch layer that knows the charset). */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    // lowercase scheme://authority, leave path+query casing alone
    val prefix = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    val joined = concat(prefix, rest)
    val noPort = regexp_replace(
      regexp_replace(joined, "^(http://[^/:?#]+):80([/?]|$)", "$1$2"),
      "^(https://[^/:?#]+):443([/?]|$)", "$1$2")
    // [?&] left boundary so 'my_utm_source' / 'xgclid' style params are
    // NOT corrupted; the separator is restored ($1) and duplicates are
    // tidied afterwards (an unanchored match would also bite inside path
    // segments — with the boundary only a literal '&' in a path can
    // still trigger, an accepted rarity documented here). (?i) because
    // param NAMES are case-insensitively duplicated in the wild
    // (UTM_SOURCE=/Gclid= variants would otherwise survive and split
    // dedup keys), and [a-z0-9_]+ so suffixed names (utm_source_id)
    // strip whole instead of leaving '_id=...' residue; param VALUES
    // keep their case — only the name match is case-blind.
    val noTrack = regexp_replace(noPort,
      "(?i)([?&])(utm_[a-z0-9_]+|fbclid|gclid|msclkid)=[^&#]*", "$1")
    // tidy: collapse '&&', then '?&' -> '?', then trailing '?'/'&' drop
    regexp_replace(regexp_replace(regexp_replace(noTrack,
      "&&+", "&"), "\\?&", "?"), "[?&]$", "")
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-corpus text preparation: URL canonicalization, HTML boilerplate
  * stripping, and readability scoring — the front half of a web-crawl
  * training-data pipeline (the reference ingests already-clean files at
  * `modules/utilities.py:139-169`; a 100 TB crawl pipeline has to produce
  * those clean files first, which is what these functions do).
  *
  * Every function here is a narrow, codegen'd column expression (regexp /
  * string built-ins only — no UDFs), so all three ops run inside the scan
  * stage with zero shuffles; per-host / per-source aggregation afterwards is
  * one map-side-combinable hash agg. All regex patterns are restricted to
  * the RE2-compatible subset (no backreferences, no lookaround) so the
  * DuckDB oracle replays them verbatim — RE2 silently matches NOTHING on a
  * backreference rather than erroring, which is why `stripHtml` spells the
  * script|style block out as an alternation.
  */
object WebFunctions {

  private val UrlParts = "^([^:]+)://([^/?#]+)([^?#]*)"

  /** Scheme of a URL, lowercased ("" when unparseable). */
  def urlScheme(url: Column): Column = lower(regexp_extract(url, UrlParts, 1))

  /** Normalized host: lowercased, default :80/:443 port stripped. */
  def urlHost(url: Column): Column =
    regexp_replace(lower(regexp_extract(url, UrlParts, 2)), ":(443|80)$", "")

  /** Registrable host for per-site aggregation: [[urlHost]] minus a
    * leading `www.`. */
  def urlRegistrableHost(url: Column): Column =
    regexp_replace(urlHost(url), "^www\\.", "")

  /** Canonical URL — the dedup key a crawl pipeline groups fetches by:
    * lowercase scheme + host, strip default port, drop the fragment, drop
    * `utm_*` tracking params (keeping remaining params in original order).
    * Path case is preserved (paths are case-sensitive; hosts are not).
    */
  def normalizeUrl(url: Column): Column = {
    val path = regexp_extract(url, UrlParts, 3)
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = array_join(
      filter(split(query, "&"), p => !p.startsWith("utm_")), "&")
    concat(
      urlScheme(url), lit("://"), urlHost(url), path,
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }

  /** Strip HTML to visible text: script/style blocks, then a nav/chrome
    * boilerplate block, then all remaining tags; decode the common
    * entities; squeeze whitespace. One chained codegen expression — the
    * 100 TB shape is "this happens inside the scan".
    *
    * `boilerplateClass` names a single CSS class whose whole `<div>` block
    * is treated as chrome and dropped (a deterministic stand-in for
    * readability/trafilatura-style main-content extraction, which is
    * heuristic and version-dependent — the PIPELINE shape is identical).
    */
  def stripHtml(html: Column, boilerplateClass: String = "nav"): Column = {
    val noBlocks = regexp_replace(html,
      "(?s)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>", " ")
    val noNav = regexp_replace(noBlocks,
      s"""(?s)<div class="$boilerplateClass">.*?</div>""", " ")
    val noTags = regexp_replace(noNav, "<[^>]*>", " ")
    val decoded = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(noTags, "&amp;", "&"),
            "&lt;", "<"),
          "&gt;", ">"),
        "&nbsp;", " "),
      "&[a-z]+;", " ") // any remaining named entity is dropped, not kept as noise
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Number of syllables in `text` under the standard vowel-group
    * heuristic (each maximal run of `[aeiouy]` = one syllable, floor 1). */
  def syllableCount(text: Column): Column =
    greatest(size(regexp_extract_all(text, lit("[aeiouy]+"), lit(0))), lit(1))

  /** Flesch reading-ease over space-tokenized text with `.`-terminated
    * sentences, rounded to 4 decimals (per-row arithmetic is identical
    * IEEE ops in the same order on both engines, so round-4 is stable).
    * `206.835 - 1.015*(words/sentences) - 84.6*(syllables/words)`. */
  def fleschReadingEase(text: Column): Column = {
    val nWords = size(split(text, " "))
    val nSents = greatest(size(regexp_extract_all(text, lit("\\."), lit(0))), lit(1))
    val nSyll = syllableCount(text)
    round(lit(206.835)
      - lit(1.015) * nWords.cast("double") / nSents.cast("double")
      - lit(84.6) * nSyll.cast("double") / nWords.cast("double"), 4)
  }
}

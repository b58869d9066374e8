package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions (SURVEY.md §2.5) — all built from
  * `org.apache.spark.sql.functions` so they stay inside whole-stage
  * codegen (no Scala UDFs in the hot path). Every function has an
  * exact DuckDB-SQL equivalent for the oracle.
  */
object TextFns {

  /** Canonical tokenization: lowercase, trim, split on whitespace. */
  def toks(c: Column): Column = split(lower(trim(c)), "\\s+")

  def tokenCount(c: Column): Column = size(toks(c)).cast("long")

  /** BPE-ish subword segmentation: letter runs / digit runs / single
    * punctuation — the classic pre-tokenizer regex.
    */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeCount(c: Column): Column = regexp_count(c, lit(BpePattern)).cast("long")

  /** Distinct word n-gram shingles; whole text as one shingle for
    * docs shorter than n tokens. Native loop via [[WordNgrams]].
    */
  def shingles(c: Column, n: Int): Column =
    array_distinct(WordNgrams(toks(c), n))

  def distinctToks(c: Column): Column = array_distinct(toks(c))

  /** Count of tokens found in `words`. */
  def tokensIn(c: Column, words: Seq[String]): Column =
    size(filter(toks(c), t => t.isin(words: _*))).cast("long")

  /** Canonical token-sort fingerprint: md5 of the sorted distinct
    * token set — byte-identical with the DuckDB md5.
    */
  def fingerprint(c: Column): Column =
    md5(array_join(sort_array(distinctToks(c)), " "))

  /** Normalized text for normalized-exact dedup: lowercase, strip
    * non-alnum, collapse whitespace.
    */
  def normalized(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), "\\s+", " "))

  /** Rabin–Karp-style polynomial rolling hash of the whole document
    * (base 257 mod 2^31−1) — content-addressed and order-sensitive,
    * unlike the token-sort [[fingerprint]]. Backed by the codegen'd
    * [[RollingHash]] expression; the equivalent
    * `aggregate(transform(split(...)))` composition runs an
    * interpreted lambda per character (PropertySpec pins equality
    * between the two).
    */
  def rollingHash(c: Column): Column = RollingHash(c)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared deterministic text/hash primitives used by the dedup, text-analysis
  * and similarity operators (SURVEY.md §7 step 8 — scale extensions).
  *
  * Everything here is a composition of codegen'd built-ins (no UDFs): the
  * documents pipeline stays inside whole-stage codegen and is embarrassingly
  * parallel — per-row expressions, no shuffle — so it scales linearly with
  * input splits at 100 TB.
  *
  * Portability: hashes are defined as the first 15 hex digits of md5
  * (a 60-bit value), not Spark's xxhash/murmur, so the DuckDB oracle can
  * reproduce them bit-for-bit: Spark `conv(substring(md5(x),1,15),16,10)`
  * == DuckDB `('0x'||substr(md5(x),1,15))::BIGINT`.
  */
object TextFns {

  /** Deterministic 60-bit hash of a string, portable across engines. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Whitespace tokens of the raw text. Engine/oracle portability
    * caveat (shared by every consumer's DuckDB twin, q46/q64/q74 …):
    * Java's `\s` includes vertical tab (\x0B), RE2's does not — a
    * document with a vertical tab BETWEEN words would tokenize
    * differently across the two engines. The corpora are \x0B-free;
    * a deployment ingesting arbitrary bytes should normalize control
    * whitespace at ingest (the scrub stage) before token-count
    * semantics matter. */
  def wsTokens(c: Column): Column = split(trim(c), "\\s+")

  /** Word n-gram shingles (default 3). Documents shorter than n words
    * collapse to one (shorter) shingle via the greatest(…,1) guard.
    *
    * PERFORMANCE hazard (measured r19, q88): the tokenize is inlined
    * inside the transform lambda, and higher-order functions evaluate
    * interpreted — the regex split re-runs PER SHINGLE (~n_tokens× per
    * row). A hot-path consumer should bind the token array in its own
    * projection first and build the same transform over the bound
    * column ([[graft.operators.SubstringDedup]]'s windowRel shape —
    * once per row, ~5× the pass). This composable form stays as the
    * equality oracle; the dedup hot paths use the native
    * [[MinHashFns.shingleSet]] expression. */
  def shingles(c: Column, n: Int = 3): Column = {
    val w = wsTokens(c)
    transform(
      sequence(lit(1), greatest(size(w) - lit(n - 1), lit(1))),
      i => concat_ws(" ", slice(w, i, lit(n))))
  }

  /** Distinct word n-gram shingles (for Jaccard set semantics). */
  def shingleSet(c: Column, n: Int = 3): Column = array_distinct(shingles(c, n))

  /** Normalized-text fingerprint: lowercase, non-alphanumerics collapsed to
    * single spaces, then md5 — a content-defined document identity robust to
    * whitespace/punctuation noise. */
  def fingerprint(c: Column): Column =
    md5(trim(regexp_replace(lower(c), "[^a-z0-9]+", " ")))
}

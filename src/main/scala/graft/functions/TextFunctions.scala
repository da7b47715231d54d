package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the LLM-data-pipeline operators
  * (SURVEY.md §2.3 R18/R20): tokenization, shingling, MinHash, SimHash,
  * fingerprints. All pure Catalyst expressions (split / higher-order
  * functions / xxhash64) — distributed, no driver-side loops, no UDFs.
  *
  * The higher-order builders take a SQL fragment (usually a column name)
  * rather than a Column, because they compose inside expr() lambda bodies.
  *
  * Where a step is hash-based (MinHash/SimHash/xxhash64 fingerprints) the
  * results are Spark-specific and the registered queries carry no DuckDB
  * oracle (rows-only check per the driver contract); the SQL-expressible
  * slices (token stats, Jaccard, sha256 fingerprints) are oracled.
  */
object TextFunctions {

  /** Whitespace tokenizer (documents are single-space word soup). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword-ish tokenizer: runs of letters or runs of digits —
    * the classic pre-tokenization regex shape.
    */
  def regexTokens(textSql: String): Column =
    expr(s"regexp_extract_all($textSql, '[a-z]+|[0-9]+', 0)")

  /** Distinct n-word shingles — the native graft.plans.Shingles expression
    * (single split pass + hash-set dedupe; the pure-SQL CASE/split/transform
    * formulation re-splits the text per step through interpreted lambdas).
    * Callers must have run GraftFunctions.register(spark). Empty array when
    * the doc has fewer than n tokens.
    */
  def shingles(textSql: String, n: Int): Column = expr(s"graft_shingles($textSql, $n)")

  /** LSH band keys: split a k-length signature into `bands` bands of
    * `rowsPerBand` each and hash each band; docs sharing any (band, hash)
    * pair become dedup candidates. Returns ARRAY<STRUCT<band INT, h BIGINT>>
    * for explode + shuffle-on-band-key — the bounded-join scale path.
    */
  def minhashBands(sigColSql: String, bands: Int, rowsPerBand: Int): Column =
    expr(
      s"""transform(sequence(0, ${bands - 1}),
            b -> struct(b AS band,
                        xxhash64(concat_ws(',', slice($sigColSql, b * $rowsPerBand + 1, $rowsPerBand))) AS h))""")

  /** 64-bit SimHash over a token-array SQL fragment — the native
    * graft.plans.SimHashSig expression (one hash per token, all 64 bit
    * counters in a single pass; the pure-HOF formulation re-hashed every
    * token 64 times). Callers must have run GraftFunctions.register(spark).
    */
  def simhash(tokenColSql: String): Column = expr(s"graft_simhash($tokenColSql)")

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(a) + size(b) - size(array_intersect(a, b))
    when(uni > 0, inter / uni).otherwise(lit(0.0))
  }

  /** Content fingerprint: sha256 hex (oracle-able) — the content-addressed
    * id for exact dedup and multimodal payloads.
    */
  def sha256Hex(c: Column): Column = sha2(c.cast("binary"), 256)

  /** Rolling-hash document fingerprint (winnowing-style): the minimum
    * xxhash64 over 5-gram shingles — a cheap near-dup prefilter key. The
    * fastest form for production sharding; hash values are engine-specific
    * (spec-tested, not oracle-able).
    */
  def rollingFingerprint(textSql: String): Column =
    expr(s"array_min(transform(graft_shingles($textSql, 5), sh -> xxhash64(sh)))")

  /** Oracle-able twin of [[rollingFingerprint]]: minimum md5 hex digest
    * over the same 5-gram shingles. Winnowing only needs SOME uniform hash,
    * and md5 produces identical lowercase hex in Spark and DuckDB, so the
    * selected fingerprint value itself is verifiable cross-engine
    * (lexicographic min of hex strings = min of the 128-bit values).
    */
  def rollingFingerprintMd5(textSql: String): Column =
    expr(s"array_min(transform(graft_shingles($textSql, 5), sh -> md5(sh)))")
}

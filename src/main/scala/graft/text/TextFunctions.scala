package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by text analysis + dedup ops.
  *
  * Everything is built from codegen'd built-ins (`functions._` / `expr`)
  * — no UDFs — and every primitive has an exact DuckDB rendering so the
  * oracle can replay it bit-for-bit. The portable 64-bit hash is the
  * first 15 hex digits of md5 (60 bits, fits BIGINT in both engines).
  */
object TextFunctions {

  /** Deterministic 60-bit hash of a string, identical in DuckDB via
    * ('0x' || substr(md5(s),1,15))::BIGINT. */
  def hash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def hash64Sql(e: String): String = s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  /** Whitespace tokens of trimmed text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokensSql(e: String): String = s"string_split_regex(trim($e), '\\s+')"

  /** Lowercased alnum-only normalization (dedup canonical form).
    * Compiled char-loop kernel ≡ regexp_replace(lower(c),'[^a-z0-9 ]','')
    * — the round-10 triage found the java.util.regex pass dominates
    * every hash64(normalize(text)) corpus scan (31 of 35 s CPU at sf5)
    * and contention-inflates ~5× at 32 threads; the kernel is
    * allocation-free per char and keeps the stage in codegen. */
  def normalize(c: Column): Column =
    graft.functions.native.normalize_ascii(c)

  def normalizeSql(e: String): String =
    s"regexp_replace(lower($e), '[^a-z0-9 ]', '', 'g')"

  /** Word n-gram (shingle) array: adjacent k-token windows joined by a
    * space. transform over token indices — pure codegen, no shuffle. */
  def shingles(toks: Column, k: Int): Column =
    expr_shingles(toks, k)

  private def expr_shingles(toks: Column, k: Int): Column = {
    // slice per start index i = 1..n-k+1, join with ' '. Guard n<k:
    // Spark's sequence(1, 0) counts DOWN to [1,0]; we need empty.
    val cnt = size(toks) - lit(k - 1)
    when(cnt >= 1,
      transform(sequence(lit(1), cnt), i => concat_ws(" ", slice(toks, i, lit(k)))))
      .otherwise(array().cast("array<string>"))
  }

  def shinglesSql(toksE: String, k: Int): String =
    s"list_transform(generate_series(1, greatest(len($toksE) - ${k - 1}, 0)), " +
      s"i -> array_to_string(list_slice($toksE, i, i + ${k - 1}), ' '))"

  /** Polynomial rolling hash over character codes of `s`:
    * fold h -> (h*131 + code) % 1e9+7. No overflow (max 1.3e11). */
  def polyHash(c: Column): Column =
    graft.functions.native.poly_hash_chars(c)

  def polyHashSql(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($e, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(a, b) -> (a * 131 + b) % 1000000007)"

  val M: Long = 1000000007L

  /** Per-token polynomial hashes of normalized text — the shared cheap
    * arithmetic base for minhash/simhash/ngram ops (the md5-based
    * hash64 chain is ~15× slower per element when interpreted). */
  def tokenHashes(c: Column): Column =
    transform(tokens(normalize(c)), t => polyHash(t))

  def tokenHashesSql(e: String): String =
    s"list_transform(${tokensSql(normalizeSql(e))}, t -> ${polyHashSql("t")})"

  /** k-shingle hashes combined arithmetically from token hashes:
    * s_i = fold over window of (acc*131 + th) % M — no string shingles,
    * no per-shingle rehash. */
  def shingleHashCombine(th: Column, k: Int): Column = {
    val cnt = size(th) - lit(k - 1)
    when(cnt >= 1,
      transform(sequence(lit(1), cnt), i =>
        (0 until k).foldLeft(lit(0L)) { (acc, j) =>
          (acc * 131 + element_at(th, i + lit(j))) % M
        }))
      .otherwise(array().cast("array<bigint>"))
  }

  def shingleHashCombineSql(thE: String, k: Int): String = {
    val body = (0 until k).foldLeft("CAST(0 AS BIGINT)") { (acc, j) =>
      val idx = if (j == 0) "i" else s"i + $j"
      s"($acc * 131 + $thE[$idx]) % $M"
    }
    s"list_transform(generate_series(1, greatest(len($thE) - ${k - 1}, 0)), i -> $body)"
  }
}

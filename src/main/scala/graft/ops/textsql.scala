package graft.ops

/** Cross-engine deterministic primitives for the LLM-pipeline operators
  * (SURVEY.md §2.11). Each helper returns the SAME computation as a Spark SQL
  * expression string and as a DuckDB expression string; keeping the pair in
  * one function is what guarantees the DuckDB oracle hash-matches.
  *
  * Determinism rules used here:
  *  - hashes are md5-based (identical hex in both engines), folded to 60 bits
  *    and reduced mod p = 2^31-1 with small-prime affine families;
  *  - float vectors are cast element-wise to DOUBLE, multiplied, then
  *    LEFT-FOLDED in array order (Spark `aggregate` ≡ DuckDB `list_reduce`
  *    with a prepended 0) — bit-identical, order-independent of partitioning
  *    because the fold happens inside one row;
  *  - ratio/score arithmetic is written with explicit CASTs in identical
  *    operation order, all per-row IEEE double (no cross-row float sums).
  */
object textsql {
  /** Mersenne prime 2^31-1: small enough that a*h+b stays in int64. */
  val P = 2147483647L
  /** Affine minhash family (a_i * h + b_i) mod P, i < 8. */
  val A: Seq[Long] = Seq(2, 3, 5, 7, 11, 13, 17, 19)

  /** 60-bit base hash of a string expression, reduced mod P — the input
    * to the affine minhash family (which needs values < P). */
  def sparkHash(s: String) =
    s"CAST(conv(substring(md5($s), 1, 15), 16, 10) AS BIGINT) % $P"
  def duckHash(s: String) =
    s"CAST('0x' || substr(md5($s), 1, 15) AS BIGINT) % $P"

  /** FULL 60-bit md5-prefix hash, NO mod-P reduction — for families that
    * gate EQUALITY directly on the hash (the substring-dedup window gate):
    * a 31-bit space collides at birthday rate from ~65k distinct values
    * (phantom duplicated windows → silent strip corruption at corpus
    * scale); 2^60 holds to ~10^9 windows. Minhash keeps the reduced form
    * above because its affine family arithmetic requires values < P. */
  def sparkHash60(s: String) =
    s"CAST(conv(substring(md5($s), 1, 15), 16, 10) AS BIGINT)"
  def duckHash60(s: String) =
    s"CAST('0x' || substr(md5($s), 1, 15) AS BIGINT)"

  /** Word tokens (texts are single-space separated). */
  def sparkToks(t: String) = s"split($t, ' ')"
  def duckToks(t: String) = s"string_split($t, ' ')"

  /** All 3-word shingles of a token array (assumes size ≥ 3 — filter first). */
  def sparkShingles(toks: String) =
    s"transform(sequence(1, size($toks) - 2), i -> concat_ws(' ', slice($toks, i, 3)))"
  def duckShingles(toks: String) =
    s"list_transform(generate_series(1, len($toks) - 2), i -> array_to_string($toks[i:i+2], ' '))"

  /** Width-`w` word shingles (assumes size ≥ w — filter first); the 3-word
    * pair above stays verbatim because the minhash keys hash its exact
    * output strings. */
  def sparkShinglesW(toks: String, w: Int) =
    s"transform(sequence(1, size($toks) - ${w - 1}), i -> concat_ws(' ', slice($toks, i, $w)))"
  def duckShinglesW(toks: String, w: Int) =
    s"list_transform(generate_series(1, len($toks) - ${w - 1}), i -> array_to_string($toks[i:i+${w - 1}], ' '))"

  /** Ordered-fold dot product of two float arrays, in double. */
  def sparkDot(a: String, b: String) =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
  def duckDot(a: String, b: String) =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (x, y) -> x + y)"

  /** cosine(a, b) — same bits in both engines (sqrt/÷ are IEEE-exact). */
  def sparkCos(a: String, b: String) =
    s"${sparkDot(a, b)} / (sqrt(${sparkDot(a, a)}) * sqrt(${sparkDot(b, b)}))"
  def duckCos(a: String, b: String) =
    s"${duckDot(a, b)} / (sqrt(${duckDot(a, a)}) * sqrt(${duckDot(b, b)}))"

  /** Sign-bit LSH bucket from the first `bits` vector dims (1-indexed col). */
  def sparkSignBucket(e: String, bits: Int): String =
    (0 until bits).map(d => s"(CASE WHEN element_at($e, ${d + 1}) > 0 THEN ${1L << d} ELSE 0 END)")
      .mkString(" + ")
  def duckSignBucket(e: String, bits: Int): String =
    (0 until bits).map(d => s"(CASE WHEN $e[${d + 1}] > 0 THEN ${1L << d} ELSE 0 END)")
      .mkString(" + ")

  /** Polynomial rolling hash over characters, mod 1e9+7 (left fold). */
  def sparkRollHash(t: String) =
    s"aggregate(transform(sequence(1, length($t)), i -> ascii(substring($t, i, 1))), CAST(0 AS BIGINT), (acc, c) -> (acc * 131 + c) % 1000000007)"
  def duckRollHash(t: String) =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(generate_series(1, length($t)), i -> CAST(ascii(substr($t, i, 1)) AS BIGINT))), (acc, c) -> (acc * 131 + c) % 1000000007)"
}

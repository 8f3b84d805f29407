package graft

/** Builders for DuckDB oracle SQL that reproduces the engine's from-scratch
  * 64-bit hash arithmetic bit-exactly (splitmix64, FNV-1a, rotations).
  *
  * DuckDB has no wrapping 64-bit multiply (BIGINT/HUGEINT arithmetic is
  * overflow-checked), so `a*b mod 2^64` is built from 32-bit halves in the
  * UBIGINT/HUGEINT domain:
  *   a*b ≡ alo·blo + ((alo·bhi + ahi·blo) mod 2^32)·2^32   (mod 2^64)
  * — every term fits INT128. These fragments make the sketch queries
  * (simhash, fingerprint, seed-derived tables) verifiable by a REAL
  * independent oracle instead of rows-only checks.
  */
object OracleSql {

  val M64 = "18446744073709551616" // 2^64 as a HUGEINT literal
  val FnvOffset = 1469598103934665603L // graft.text.Dedup.hash64 offset (from-scratch)
  val FnvPrime = 1099511628211L

  /** `(a * bconst) mod 2^64` — `a` must be a HUGEINT-typed SQL expression in
    * [0, 2^64); bconst an unsigned 64-bit constant (given as Scala Long bits). */
  def mulmod(a: String, bconst: Long): String = {
    val b = BigInt(bconst) & BigInt("FFFFFFFFFFFFFFFF", 16)
    val blo = b % (BigInt(1) << 32)
    val bhi = b >> 32
    s"(((($a) % 4294967296) * $blo + (((($a) % 4294967296) * $bhi + (($a) // 4294967296) * $blo) % 4294967296) * 4294967296) % $M64)"
  }

  /** splitmix64 finalizer (graft.synth.ImageSynth.mix) over a UBIGINT column
    * expression, as a chain of CTE-friendly steps. Returns one inline
    * expression (deeply nested but mechanical). */
  def mix(x: String): String = {
    val z1 = s"((($x)::HUGEINT + 11400714819323198485) % $M64)::UBIGINT"
    val z2 = mulmod(s"xor($z1, $z1 >> 30)::HUGEINT", 0xBF58476D1CE4E5B9L) + "::UBIGINT"
    val z3 = mulmod(s"xor($z2, $z2 >> 27)::HUGEINT", 0x94D049BB133111EBL) + "::UBIGINT"
    s"xor($z3, $z3 >> 31)"
  }

  /** Like [[mix]] but staged through named CTE columns for readability/speed:
    * emits `(selectExprs, finalCol)` to be placed in successive CTEs.
    * Stage i consumes column `prev` and defines `out`. */
  def mixStages(prev: String, out: String): Seq[String] = Seq(
    s"((($prev)::HUGEINT + 11400714819323198485) % $M64)::UBIGINT AS ${out}_z1",
    mulmod(s"xor(${out}_z1, ${out}_z1 >> 30)::HUGEINT", 0xBF58476D1CE4E5B9L) + s"::UBIGINT AS ${out}_z2",
    mulmod(s"xor(${out}_z2, ${out}_z2 >> 27)::HUGEINT", 0x94D049BB133111EBL) + s"::UBIGINT AS ${out}_z3",
    s"xor(${out}_z3, ${out}_z3 >> 31) AS $out")

  /** FNV-1a 64 (graft.text.Dedup.hash64) of a VARCHAR expression `tok`,
    * via list_reduce over its UTF-16 code units (corpus is ASCII — code
    * points == code units, parity asserted in TextSpec). */
  def fnvHash(tok: String): String = {
    val step = mulmod("xor(h, c)::HUGEINT", FnvPrime) + "::UBIGINT"
    s"""list_reduce(list_prepend($FnvOffset::UBIGINT,
       |  list_transform(string_split_regex($tok, ''), ch -> unicode(ch)::UBIGINT)),
       |  (h, c) -> ($step))""".stripMargin
  }

  /** graft.text.TextOps.fingerprint of a VARCHAR `text`: FNV over each
    * token's chars, rotl13 between tokens — encoded as one reduce over a
    * char-code stream with a sentinel (2^32, no real code unit) marking
    * token ends. */
  def fingerprint(text: String): String = {
    val sent = "4294967296::UBIGINT"
    val fnvStep = mulmod("xor(h, c)::HUGEINT", FnvPrime) + "::UBIGINT"
    val rotl13 = "(" + mulmod("h::HUGEINT", 8192L) + " + (h >> 51))::UBIGINT"
    s"""list_reduce(list_prepend($FnvOffset::UBIGINT, flatten(list_transform(string_split($text, ' '),
       |  tok -> list_append(list_transform(string_split_regex(tok, ''), ch -> unicode(ch)::UBIGINT), $sent)))),
       |  (h, c) -> (CASE WHEN c = $sent THEN $rotl13 ELSE $fnvStep END))""".stripMargin
  }

  /** graft.text.Dedup.simhash64 over the `documents` table → CTE text
    * defining `sim(doc_id, sh)` (sh as UBIGINT; bit-identical to the Scala
    * signed long). */
  def simhashCte: String =
    s"""t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |th AS (SELECT doc_id, ${fnvHash("tok")} AS th FROM t),
       |v AS (SELECT doc_id, b, sum(CASE WHEN (th >> b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
       |      FROM th, range(64) r(b) GROUP BY 1, 2),
       |sim AS (SELECT doc_id, sum(CASE WHEN vote > 0 THEN (1::UBIGINT << b) ELSE 0 END)::UBIGINT AS sh
       |        FROM v GROUP BY 1)""".stripMargin
}

package graft.operators

/** DuckDB-SQL generator for seed-0 XXH64 over short ASCII strings —
  * the hash-parity layer that lets the SimHash/fingerprint entries
  * (d04, d05, t04) graduate from rows-only to fully DuckDB-oracled.
  *
  * The oracle engine has no XXH64 builtin, so the oracle SQL computes
  * the hash itself: bytes via `unicode(substr(w,i,1))` (the corpus is
  * pure ASCII — `octet_length(encode(text)) == length(text)` holds at
  * every SF), and all mod-2⁶⁴ arithmetic in HUGEINT with explicit
  * reductions. A 64×64-bit product would overflow HUGEINT (2¹²⁸ >
  * 2¹²⁷−1), so `mulmod` splits the left operand into 32-bit halves:
  * a·b ≡ (aˡᵒ·b mod 2⁶⁴) + ((aʰⁱ·b mod 2³²)·2³² mod 2⁶⁴); each partial
  * stays below 2⁹⁶. Rotations are division/multiplication by powers of
  * two on the same representation; XOR round-trips through UBIGINT
  * (DuckDB's xor is not defined on HUGEINT).
  *
  * Only the tail path of XXH64 is emitted (inputs < 32 bytes — the
  * corpus maxes out at 8-byte words); a ≥32-byte word hashes to NULL so
  * a future corpus change fails the compare loudly instead of silently
  * matching a wrong stripe-path transcription.
  *
  * Validated two ways: the generated SQL reproduces the public XXH64
  * vectors ("", "abc" — same vectors TrinoFunctionsSpec pins on the
  * Spark side), and d04/d05/t04 hash-match Spark end-to-end at sf0.01.
  *
  * Cost discipline: the expression is heavyweight, so callers hash the
  * DISTINCT vocabulary (31 words at every SF; always ≪ token count)
  * inside a MATERIALIZED CTE and join the tokens against it — without
  * this, 32 oracle threads each vectorizing the full nested-list
  * expression over every token row exhaust the DuckDB allocator. */
object XxhOracle {

  private val M64 = "18446744073709551616::HUGEINT"
  private val P1 = "11400714785074694791::HUGEINT"
  private val P2 = "14029467366897019727::HUGEINT"
  private val P3 = "1609587929392839161::HUGEINT"
  private val P4 = "9650029242287828579::HUGEINT"
  private val P5 = "2870177450012600261::HUGEINT"

  private def mulmod(a: String, b: String): String =
    s"((((($a) % 4294967296::HUGEINT) * ($b)) % $M64" +
      s" + (((($a) // 4294967296::HUGEINT) * ($b)) % 4294967296::HUGEINT)" +
      s" * 4294967296::HUGEINT) % $M64)"

  private def rotl(x: String, r: Int): String = {
    val lo = BigInt(1) << (64 - r)
    val hi = BigInt(1) << r
    s"(((($x) % $lo::HUGEINT) * $hi::HUGEINT) + (($x) // $lo::HUGEINT))"
  }

  private def xor(a: String, b: String): String =
    s"(xor(CAST(($a) AS UBIGINT), CAST(($b) AS UBIGINT))::HUGEINT)"

  private def addmod(a: String, b: String): String =
    s"((($a) + ($b)) % $M64)"

  private def shr(x: String, r: Int): String =
    s"(($x) // ${BigInt(1) << r}::HUGEINT)"

  private def lane8Step(acc: String, lane: String): String = {
    val k = mulmod(rotl(mulmod(lane, P2), 31), P1)
    addmod(mulmod(rotl(xor(acc, k), 27), P1), P4)
  }

  private def lane4Step(acc: String, lane: String): String =
    addmod(mulmod(rotl(xor(acc, mulmod(lane, P1)), 23), P2), P3)

  private def byteStep(acc: String, b: String): String =
    mulmod(rotl(xor(acc, mulmod(b, P5)), 11), P1)

  private def avalanche(h0: String): String = {
    val h1 = mulmod(xor(h0, shr(h0, 33)), P2)
    val h2 = mulmod(xor(h1, shr(h1, 29)), P3)
    xor(h2, shr(h2, 32))
  }

  /** XXH64(ascii string in column `w`, seed 0) as HUGEINT in [0, 2⁶⁴);
    * NULL for inputs ≥ 32 bytes (stripe path intentionally absent). */
  def hashSql(w: String): String = {
    val bs = s"list_transform(range(1, length($w) + 1)," +
      s" i -> unicode(substr($w, i, 1))::HUGEINT)"
    val h0 = addmod(P5, s"length($w)::HUGEINT")
    // full 8-byte lanes, little-endian: fold the reversed byte slice
    val le64 = s"list_reduce(list_reverse(($bs)[8*j+1:8*j+8])," +
      " (a, b) -> a * 256::HUGEINT + b)"
    val lanes8 = s"CASE WHEN length($w) >= 8 THEN" +
      s" list_transform(range(0, length($w) // 8), j -> $le64) ELSE [] END"
    val h1 = s"CASE WHEN len($lanes8) > 0 THEN" +
      s" list_reduce(list_prepend($h0, $lanes8)," +
      s" (acc, lane) -> ${lane8Step("acc", "lane")}) ELSE $h0 END"
    val off4 = s"8 * (length($w) // 8)"
    val le32 = s"list_reduce(list_reverse(($bs)[($off4)+1:($off4)+4])," +
      " (a, b) -> a * 256::HUGEINT + b)"
    val h2 = s"CASE WHEN length($w) % 8 >= 4 THEN ${lane4Step(h1, le32)}" +
      s" ELSE ($h1) END"
    val offb = s"(8 * (length($w) // 8)" +
      s" + CASE WHEN length($w) % 8 >= 4 THEN 4 ELSE 0 END)"
    val tail = s"($bs)[($offb)+1:length($w)]"
    val h3 = s"CASE WHEN len($tail) > 0 THEN" +
      s" list_reduce(list_prepend(($h2), $tail)," +
      s" (acc, b) -> ${byteStep("acc", "b")}) ELSE ($h2) END"
    s"(CASE WHEN length($w) < 32 THEN (${avalanche(h3)}) ELSE NULL END)"
  }

  /** CTE prelude `tok, vocab, wh`: token stream + per-distinct-word
    * XXH64 — join tokens back on `w` to pick up column `h`. */
  val wordHashCtes: String =
    s"""tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |vocab AS (SELECT DISTINCT w FROM tok),
       |wh AS MATERIALIZED (SELECT w, ${hashSql("w")} AS h FROM vocab)""".stripMargin

  /** 64-row (bit, pw=2^bit) literal table — HUGEINT powers for bit
    * extraction (`h // pw % 2`) without a shift operator. */
  val bitPowersCte: String =
    "bits AS (SELECT * FROM (VALUES " +
      (0 until 64).map(b => s"($b, ${BigInt(1) << b}::HUGEINT)").mkString(", ") +
      ") t(bit, pw))"

  /** CTE chain ending in `fs(doc_id, simhash BIGINT)` — the exact
    * SimHashAggregate semantics: one ±1 vote per TOKEN INSTANCE per bit
    * (tf-weighted via the (doc,word) count), bit set iff votes > 0,
    * reassembled and reinterpreted as a signed 64-bit value. */
  val simhashCtes: String =
    s"""$wordHashCtes,
       |tw AS (SELECT doc_id, w, COUNT(*)::HUGEINT AS cnt FROM tok GROUP BY 1, 2),
       |hw AS (SELECT doc_id, cnt, h FROM tw JOIN wh USING (w)),
       |$bitPowersCte,
       |v AS (SELECT doc_id, bit, pw, SUM(cnt * (2 * ((h // pw) % 2) - 1)) AS vote
       |      FROM hw, bits GROUP BY 1, 2, 3),
       |f AS MATERIALIZED (SELECT doc_id,
       |        SUM(CASE WHEN vote > 0 THEN pw ELSE 0::HUGEINT END) AS fp
       |      FROM v GROUP BY 1),
       |fs AS (SELECT doc_id,
       |         CAST(CASE WHEN fp >= 9223372036854775808::HUGEINT
       |              THEN fp - $M64 ELSE fp END AS BIGINT) AS simhash
       |       FROM f)""".stripMargin
}

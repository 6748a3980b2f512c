package graft.operators

/** DuckDB-SQL generator for XXH64 — the hash-parity layer that lets
  * the MinHash/SimHash/fingerprint entries (d03, d04, d05, t04)
  * graduate from rows-only to fully DuckDB-oracled.
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
  * Structure — COLUMN-CHAINED CTE STAGES, one hashing step per stage,
  * each MATERIALIZED: naive textual nesting re-expands every operand at
  * each level (a two-level hashLong composition reached 40 MB of SQL
  * and stalled the engine); with every intermediate a named column the
  * whole string hash is ~12 KB and nothing is ever evaluated twice.
  * Callers hash the DISTINCT vocabulary (≪ token count) and join the
  * token stream back against it — evaluating the expression per-token
  * exhausts the 32-thread oracle allocator.
  *
  * Only the tail path of XXH64 is emitted (inputs < 32 bytes — the
  * corpus maxes out at 8-byte words, 17-byte shingles); a ≥32-byte
  * input hashes to NULL so a corpus change fails the compare loudly
  * instead of silently matching a wrong stripe-path transcription.
  *
  * Validated: the generated SQL reproduces the public XXH64 vectors
  * ("", "abc" — the vectors TrinoFunctionsSpec pins on the Spark side)
  * and 20 random (value, seed) hashLong probes against an independent
  * reference; d03/d04/d05/t04 hash-match Spark end-to-end at sf0.01. */
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

  private def stage(name: String, src: String, col: String,
      expr: String): String =
    s"$name AS MATERIALIZED (SELECT *, $expr AS $col FROM $src)"

  /** Reinterpret an unsigned HUGEINT in [0,2⁶⁴) as a signed BIGINT. */
  def signed(u: String): String =
    s"CAST(CASE WHEN ($u) >= 9223372036854775808::HUGEINT" +
      s" THEN ($u) - $M64 ELSE ($u) END AS BIGINT)"

  /** Reinterpret a signed BIGINT's bits as HUGEINT in [0,2⁶⁴). */
  def unsigned(s0: String): String =
    s"((($s0)::HUGEINT + $M64) % $M64)"

  /** CTE chain hashing ASCII string column `w` (< 32 bytes) of CTE
    * `src` with `seed` into new column `out`; every other column of
    * `src` is carried through. Returns (cteSql, lastCteName). */
  def hashStrCtes(p: String, src: String, w: String, seed: String,
      out: String): (String, String) = {
    val bs = s"list_transform(range(1, length($w) + 1)," +
      s" i -> unicode(substr($w, i, 1))::HUGEINT)"
    val le64 = s"list_reduce(list_reverse((${p}_bs)[8*j+1:8*j+8])," +
      " (a, b) -> a * 256::HUGEINT + b)"
    val le32 = s"list_reduce(list_reverse((${p}_bs)[(${p}_o4)+1:(${p}_o4)+4])," +
      " (a, b) -> a * 256::HUGEINT + b)"
    val ctes = Seq(
      stage(s"${p}0", src, s"${p}_bs", bs),
      s"${p}1 AS MATERIALIZED (SELECT *, length($w)::HUGEINT AS ${p}_n," +
        s" 8 * (length($w) // 8) AS ${p}_o4," +
        s" (8 * (length($w) // 8) + CASE WHEN length($w) % 8 >= 4 THEN 4 ELSE 0 END) AS ${p}_ob" +
        s" FROM ${p}0)",
      stage(s"${p}2", s"${p}1", s"${p}_h0", addmod(addmod(seed, P5), s"${p}_n")),
      stage(s"${p}3", s"${p}2", s"${p}_l8",
        s"CASE WHEN length($w) >= 8 THEN" +
          s" list_transform(range(0, length($w) // 8), j -> $le64) ELSE [] END"),
      stage(s"${p}4", s"${p}3", s"${p}_h1",
        s"CASE WHEN len(${p}_l8) > 0 THEN list_reduce(list_prepend(${p}_h0, ${p}_l8)," +
          s" (acc, lane) -> ${lane8Step("acc", "lane")}) ELSE ${p}_h0 END"),
      stage(s"${p}5", s"${p}4", s"${p}_l4",
        s"CASE WHEN length($w) % 8 >= 4 THEN $le32 ELSE NULL END"),
      stage(s"${p}6", s"${p}5", s"${p}_h2",
        s"CASE WHEN ${p}_l4 IS NOT NULL THEN ${lane4Step(s"${p}_h1", s"${p}_l4")}" +
          s" ELSE ${p}_h1 END"),
      stage(s"${p}7", s"${p}6", s"${p}_tl", s"(${p}_bs)[(${p}_ob)+1:length($w)]"),
      stage(s"${p}8", s"${p}7", s"${p}_h3",
        s"CASE WHEN len(${p}_tl) > 0 THEN list_reduce(list_prepend(${p}_h2, ${p}_tl)," +
          s" (acc, b) -> ${byteStep("acc", "b")}) ELSE ${p}_h2 END"),
      stage(s"${p}9", s"${p}8", s"${p}_a1",
        mulmod(xor(s"${p}_h3", shr(s"${p}_h3", 33)), P2)),
      stage(s"${p}A", s"${p}9", s"${p}_a2",
        mulmod(xor(s"${p}_a1", shr(s"${p}_a1", 29)), P3)),
      s"${p}B AS MATERIALIZED (SELECT * EXCLUDE (${p}_bs, ${p}_n, ${p}_o4," +
        s" ${p}_ob, ${p}_h0, ${p}_l8, ${p}_h1, ${p}_l4, ${p}_h2, ${p}_tl," +
        s" ${p}_h3, ${p}_a1)," +
        s" CASE WHEN length($w) < 32 THEN ${xor(s"${p}_a2", shr(s"${p}_a2", 32))}" +
        s" ELSE NULL END AS $out FROM ${p}A)")
    (ctes.mkString(",\n"), s"${p}B")
  }

  /** CTE chain for Spark's `XXH64.hashLong(v, seed)` (the multi-column
    * XxHash64 expression chains: hash(b, hash(a, 0))). `v`/`seed` are
    * HUGEINT-valued column names of `src`. Returns (cteSql, lastCte). */
  def hashLongCtes(p: String, src: String, v: String, seed: String,
      out: String): (String, String) = {
    val ctes = Seq(
      stage(s"${p}0", src, s"${p}_h0", addmod(addmod(s"($seed)", P5), "8::HUGEINT")),
      stage(s"${p}1", s"${p}0", s"${p}_k", mulmod(rotl(mulmod(s"($v)", P2), 31), P1)),
      stage(s"${p}2", s"${p}1", s"${p}_h1",
        addmod(mulmod(rotl(xor(s"${p}_h0", s"${p}_k"), 27), P1), P4)),
      stage(s"${p}3", s"${p}2", s"${p}_a1",
        mulmod(xor(s"${p}_h1", shr(s"${p}_h1", 33)), P2)),
      stage(s"${p}4", s"${p}3", s"${p}_a2",
        mulmod(xor(s"${p}_a1", shr(s"${p}_a1", 29)), P3)),
      s"${p}5 AS MATERIALIZED (SELECT * EXCLUDE (${p}_h0, ${p}_k, ${p}_h1, ${p}_a1)," +
        s" ${xor(s"${p}_a2", shr(s"${p}_a2", 32))} AS $out FROM ${p}4)")
    (ctes.mkString(",\n"), s"${p}5")
  }

  /** CTE prelude `tok, vocab, …, wh`: token stream + per-distinct-word
    * seed-0 XXH64 — join tokens back on `w` to pick up column `h`. */
  val wordHashCtes: String = {
    val (ctes, last) = hashStrCtes("hw", "vocab", "w", "0::HUGEINT", "h")
    s"""tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |vocab AS (SELECT DISTINCT w FROM tok),
       |$ctes,
       |wh AS MATERIALIZED (SELECT w, h FROM $last)""".stripMargin
  }

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
       |hw_j AS (SELECT doc_id, cnt, h FROM tw JOIN wh USING (w)),
       |$bitPowersCte,
       |v AS (SELECT doc_id, bit, pw, SUM(cnt * (2 * ((h // pw) % 2) - 1)) AS vote
       |      FROM hw_j, bits GROUP BY 1, 2, 3),
       |f AS MATERIALIZED (SELECT doc_id,
       |        SUM(CASE WHEN vote > 0 THEN pw ELSE 0::HUGEINT END) AS fp
       |      FROM v GROUP BY 1),
       |fs AS (SELECT doc_id, ${signed("fp")} AS simhash FROM f)""".stripMargin

  /** CTE chain ending in `sig(<idCol>, sig BIGINT[nSig])` and
    * `sz(<idCol>, n)` over a caller-provided shingle relation
    * `sh(<idCol>, s)` — the exact MinHashAggregate semantics: per
    * distinct shingle h1 = XXH64(s, seed 0), h2 = XXH64(s, seed 1)
    * forced odd, permutation j's hash is h1 + j·h2 (mod 2⁶⁴,
    * Kirsch–Mitzenmacher double hashing), minima taken over SIGNED
    * 64-bit values exactly as the aggregate's `acc < buf(j)`
    * comparison does. Parameterized so the document tier (d03: 32
    * permutations over doc shingles) and the paragraph tier (d17: 16
    * over type shingles) share one transcription. */
  def minhashSigCtes(idCol: String, nSig: Int): String = {
    val (h1c, h1last) = hashStrCtes("x1", "svocab", "s", "0::HUGEINT", "h1u")
    val (h2c, h2last) = hashStrCtes("x2", h1last, "s", "1::HUGEINT", "h2r")
    s"""svocab AS (SELECT DISTINCT s FROM sh),
       |$h1c,
       |$h2c,
       |shh AS MATERIALIZED (SELECT s, h1u, h2r + (1 - (h2r % 2)) AS h2u FROM $h2last),
       |perm AS (SELECT $idCol, j,
       |        MIN(${signed(s"(h1u + j * h2u) % $M64")}) AS sj
       |      FROM sh JOIN shh USING (s), unnest(range(0, $nSig)) t(j)
       |      GROUP BY 1, 2),
       |sz AS (SELECT $idCol, COUNT(*) AS n FROM sh GROUP BY 1),
       |sig AS MATERIALIZED (SELECT $idCol, list(sj ORDER BY j) AS sig
       |                     FROM perm GROUP BY 1)""".stripMargin
  }

  /** CTE chain for Spark's Murmur3 hash of a non-negative BIGINT
    * column (`Murmur3Hash` over LongType, seed 42 — the hash behind
    * `repartition(n, col)`'s HashPartitioning): the two 32-bit
    * little-endian halves through mixK1/mixH1, then the finalizer.
    * All 32-bit wraparound arithmetic is HUGEINT mod 2³² (a 32×32
    * product overflows BIGINT). Emits `out` as the UNSIGNED 32-bit
    * hash — `out % n` equals Spark's `pmod(signed, n)` whenever n
    * divides 2³². */
  def murmur3LongCtes(p: String, src: String, v: String,
      out: String): (String, String) = {
    val m32 = "4294967296::HUGEINT"
    def mul32(a: String, b: String) = s"((($a) * $b) % $m32)"
    def rotl32(x: String, r: Int) = {
      val lo = BigInt(1) << (32 - r)
      val hi = BigInt(1) << r
      s"(((($x) % $lo::HUGEINT) * $hi::HUGEINT) + (($x) // $lo::HUGEINT))"
    }
    def sh32(x: String, r: Int) = s"(($x) // ${BigInt(1) << r}::HUGEINT)"
    def mixK1(k: String) =
      mul32(rotl32(mul32(k, "3432918353::HUGEINT"), 15), "461845907::HUGEINT")
    def mixH1(h: String, k: String) =
      s"((${rotl32(xor(h, k), 13)} * 5 + 3864292196::HUGEINT) % $m32)"
    val ctes = Seq(
      s"${p}0 AS MATERIALIZED (SELECT *, (($v)::HUGEINT % $m32) AS ${p}_lo," +
        s" (($v)::HUGEINT // $m32) AS ${p}_hi FROM $src)",
      stage(s"${p}1", s"${p}0", s"${p}_k1", mixK1(s"${p}_lo")),
      stage(s"${p}2", s"${p}1", s"${p}_h1", mixH1("42::HUGEINT", s"${p}_k1")),
      stage(s"${p}3", s"${p}2", s"${p}_k2", mixK1(s"${p}_hi")),
      stage(s"${p}4", s"${p}3", s"${p}_h2", mixH1(s"${p}_h1", s"${p}_k2")),
      stage(s"${p}5", s"${p}4", s"${p}_f1", xor(s"${p}_h2", "8::HUGEINT")),
      stage(s"${p}6", s"${p}5", s"${p}_f2",
        mul32(xor(s"${p}_f1", sh32(s"${p}_f1", 16)), "2246822507::HUGEINT")),
      stage(s"${p}7", s"${p}6", s"${p}_f3",
        mul32(xor(s"${p}_f2", sh32(s"${p}_f2", 13)), "3266489909::HUGEINT")),
      s"${p}8 AS MATERIALIZED (SELECT * EXCLUDE (${p}_lo, ${p}_hi, ${p}_k1," +
        s" ${p}_h1, ${p}_k2, ${p}_h2, ${p}_f1, ${p}_f2)," +
        s" ${xor(s"${p}_f3", sh32(s"${p}_f3", 16))} AS $out FROM ${p}7)")
    (ctes.mkString(",\n"), s"${p}8")
  }

  /** The LSH band/candidate/estimate/verify tail shared by d03 and
    * d17, over the `sh`/`sz`/`sig` CTEs of [[minhashSigCtes]]: band
    * hashes via the chained two-long XxHash64, distinct band-collision
    * candidates, the signature-agreement screen at `estMin`, and exact
    * shingle-intersection Jaccard. Ends in `jac(a_<id>, b_<id>,
    * jaccard)`. */
  def minhashPairCtes(idCol: String, nSig: Int, estMin: String): String = {
    val (bic, bilast) = hashLongCtes("bi", "bprep", "bv1", "0::HUGEINT", "bh_in")
    val (boc, bolast) = hashLongCtes("bo", bilast, "bv2", "bh_in", "bh")
    val a = s"a_$idCol"
    val b = s"b_$idCol"
    s"""bprep AS (SELECT $idCol, b, ${unsigned("sig[2*b + 1]")} AS bv1,
       |                 ${unsigned("sig[2*b + 2]")} AS bv2
       |          FROM sig, unnest(range(0, ${nSig / 2})) t(b)),
       |$bic,
       |$boc,
       |bands AS MATERIALIZED (SELECT $idCol, b, bh FROM $bolast),
       |cand AS (SELECT DISTINCT x.$idCol AS $a, y.$idCol AS $b
       |         FROM bands x JOIN bands y
       |           ON x.b = y.b AND x.bh = y.bh AND x.$idCol < y.$idCol),
       |plaus AS (SELECT $a, $b
       |          FROM cand JOIN sig sa ON sa.$idCol = $a
       |                    JOIN sig sb ON sb.$idCol = $b
       |          WHERE CAST(list_sum(list_transform(range(1, ${nSig + 1}),
       |                  i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) AS DOUBLE)
       |                / $nSig >= $estMin),
       |common AS (SELECT $a, $b, COUNT(*) AS common
       |           FROM plaus JOIN sh x ON x.$idCol = $a
       |                      JOIN sh y ON y.$idCol = $b AND x.s = y.s
       |           GROUP BY 1, 2),
       |jac AS (SELECT p.$a, p.$b,
       |          CAST(COALESCE(c.common, 0) AS DOUBLE)
       |            / (sa.n + sb.n - COALESCE(c.common, 0)) AS jaccard
       |        FROM plaus p
       |        LEFT JOIN common c ON c.$a = p.$a AND c.$b = p.$b
       |        JOIN sz sa ON sa.$idCol = p.$a JOIN sz sb ON sb.$idCol = p.$b)""".stripMargin
  }
}

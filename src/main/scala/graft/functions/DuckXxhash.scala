package graft.functions

/** DuckDB-SQL replay of XXH64 (seed 42) — the hash behind Spark's
  * `xxhash64` and the native [[graft.plans.HashedWordGrams]] /
  * [[graft.plans.SimHash63]] / [[graft.plans.MinhashSignature]] chain —
  * so the MinHash/SimHash near-dup pipelines get FULL value oracles
  * instead of rows-only checks: DuckDB re-derives every fingerprint from
  * the raw text and the driver bit-compares the emitted pairs.
  *
  * Generates a chained-CTE fragment computing, for every row of an input
  * CTE `inp(s)` of DISTINCT ASCII strings, the signed 64-bit XXH64 of its
  * bytes. Covers the sub-32-byte path (no 32-byte stripe loop): up to
  * three 8-byte little-endian words, one optional 4-byte word, up to
  * three tail bytes, then the final avalanche. Strings of 32+ bytes give
  * NULL — a loud oracle failure, never a silent wrong hash — and
  * TestDataSpec pins the corpus token length ≤ 9 bytes (3-grams ≤ 29).
  *
  * All arithmetic runs on HUGEINT in [0, 2^64): 64-bit modular multiply
  * splits the variable operand into 32-bit halves (each partial product
  * stays < 2^65, inside HUGEINT); rotations are exact divide/multiply by
  * powers of two; `xor` is DuckDB's native HUGEINT xor. Byte access is
  * `ord(substr(...))`, valid because the corpus text is pure ASCII
  * (pinned by TestDataSpec, same contract mm01's oracle uses).
  *
  * Validated cell-for-cell against Spark's `xxhash64` on random ASCII
  * strings of every length 0-31 plus the whole corpus vocabulary.
  */
object DuckXxhash {

  val M64 = "18446744073709551616" // 2^64 as a DuckDB literal
  val P1 = java.lang.Long.parseUnsignedLong("9E3779B185EBCA87", 16)
  val P2 = java.lang.Long.parseUnsignedLong("C2B2AE3D27D4EB4F", 16)
  val P3 = java.lang.Long.parseUnsignedLong("165667B19E3779F9", 16)
  val P4 = java.lang.Long.parseUnsignedLong("85EBCA77C2B2AE63", 16)
  val P5 = java.lang.Long.parseUnsignedLong("27D4EB2F165667C5", 16)

  def u(v: Long): String = java.lang.Long.toUnsignedString(v)
  def pow2(n: Int): String =
    java.math.BigInteger.TWO.pow(n).toString

  /** (x * c) mod 2^64, x a HUGEINT expression in [0,2^64), c constant:
    * the variable operand splits into 32-bit halves so every partial
    * product stays below 2^65 (inside HUGEINT). */
  def mul64c(x: String, c: Long): String = {
    val clo = c & 0xFFFFFFFFL
    val chi = c >>> 32
    s"((($x)%4294967296)*$clo + (((($x)%4294967296)*$chi + " +
      s"(($x)//4294967296)*$clo)%4294967296)*4294967296) % $M64"
  }

  /** Exact 64-bit rotate-left by r of an unsigned HUGEINT expression. */
  def rot(x: String, r: Int): String =
    s"((($x) % ${pow2(64 - r)}) * ${pow2(r)} + (($x) // ${pow2(64 - r)}))"

  def xor(a: String, b: String): String =
    s"xor(($a)::HUGEINT, ($b)::HUGEINT)"

  /** ASCII byte at 1-based position `pos` of s, 0 beyond the end. */
  private def byteAt(pos: String): String =
    s"(CASE WHEN ($pos) <= len THEN ord(substr(s, CAST(($pos) AS INT), 1)) " +
      "ELSE 0 END)::HUGEINT"

  /** Little-endian 8-byte word k (1-based): bytes 8(k-1)+1 .. 8k. */
  private def word8(k: Int): String =
    (0 until 8).map(i => s"${byteAt((8 * (k - 1) + i + 1).toString)}*${pow2(8 * i)}")
      .mkString("(", " + ", ")")

  private def word4At(start: String): String =
    (0 until 4).map(i => s"${byteAt(s"($start)+$i")}*${pow2(8 * i)}")
      .mkString("(", " + ", ")")

  /** The CTE chain. Returns (fragment, finalCteName); the final CTE has
    * columns (s, hash) with hash a signed BIGINT (Spark's xxhash64). */
  def ctes(inp: String = "inp"): (String, String) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def add(name: String, col: String, expr: String, src: String): String = {
      out += s"$name AS (SELECT *, $expr AS $col FROM $src)"
      name
    }
    var prev = add("xx0", "len", "length(s)::HUGEINT", inp)
    // seed path for len<32: h0 = seed + PRIME5 + len  (42 + P5 below)
    prev = add("xx1", "h0", s"(${u(P5 + 42L)} + len) % $M64", prev)
    var h = "h0"
    for (k <- 1 to 3) {
      prev = add(s"xw${k}a", s"m$k",
        s"CASE WHEN len >= ${8 * k} THEN ${mul64c(word8(k), P2)} END", prev)
      prev = add(s"xw${k}b", s"r$k",
        s"CASE WHEN len >= ${8 * k} THEN ${mul64c(rot(s"m$k", 31), P1)} END", prev)
      prev = add(s"xw${k}c", s"h$k",
        s"CASE WHEN len >= ${8 * k} THEN " +
          s"(${mul64c(rot(xor(h, s"r$k"), 27), P1)} + ${u(P4)}) % $M64 " +
          s"ELSE $h END", prev)
      h = s"h$k"
    }
    prev = add("xf0", "w4",
      s"CASE WHEN len % 8 >= 4 THEN ${word4At("(len//8)*8 + 1")} END", prev)
    prev = add("xf1", "h4",
      s"CASE WHEN len % 8 >= 4 THEN " +
        s"(${mul64c(rot(xor(h, s"(w4 * ${u(P1)}) % $M64"), 23), P2)} + ${u(P3)}) % $M64 " +
        s"ELSE $h END", prev)
    h = "h4"
    prev = add("xt0", "tstart",
      "(len//8)*8 + (CASE WHEN len % 8 >= 4 THEN 4 ELSE 0 END)", prev)
    for (i <- 0 until 3) {
      val b = byteAt(s"tstart + ${i + 1}")
      prev = add(s"xb$i", s"hb$i",
        s"CASE WHEN len - tstart >= ${i + 1} THEN " +
          s"${mul64c(rot(xor(h, s"($b * ${u(P5)}) % $M64"), 11), P1)} " +
          s"ELSE $h END", prev)
      h = s"hb$i"
    }
    prev = add("xa0", "a0", xor(h, s"$h//${pow2(33)}"), prev)
    prev = add("xa1", "a1", mul64c("a0", P2), prev)
    prev = add("xa2", "a2", xor("a1", s"a1//${pow2(29)}"), prev)
    prev = add("xa3", "a3", mul64c("a2", P3), prev)
    prev = add("xa4", "a4", xor("a3", s"a3//${pow2(32)}"), prev)
    prev = add("xa5", "hash",
      s"CASE WHEN len >= 32 THEN NULL " +
        s"WHEN a4 >= ${pow2(63)} THEN (a4 - $M64)::BIGINT " +
        "ELSE a4::BIGINT END", prev)
    (out.mkString(",\n"), prev)
  }

  /** XXH64 of one 8-byte long — Spark's `XxHash64Function.hashLong`
    * (the per-field step of the multi-argument `xxhash64` fold),
    * replicated from the public XXH64 spec for deriving fold constants
    * driver-side (e.g. the accumulated seed after hashing a literal). */
  def hashLong(v: Long, seed: Long): Long = {
    var hash = seed + P5 + 8L
    val k1 = java.lang.Long.rotateLeft(v * P2, 31) * P1
    hash ^= k1
    hash = java.lang.Long.rotateLeft(hash, 27) * P1 + P4
    hash ^= hash >>> 33
    hash *= P2
    hash ^= hash >>> 29
    hash *= P3
    hash ^= hash >>> 32
    hash
  }

  /** CTE chain computing `hashLong(v, seed)` in DuckDB for an input CTE
    * `inp` carrying an unsigned-HUGEINT column `v` (other columns ride
    * along via SELECT *). Returns (fragment, finalCteName); the final
    * CTE has column `h`, the unsigned 64-bit hash. Every step is
    * MATERIALIZED: mul64c quadruples its operand expression, so an
    * inlined chain grows exponentially (the rf01 lesson). */
  def hashLongCtes(inp: String, seed: Long, prefix: String = "rh")
      : (String, String) =
    hashLongCtesExpr(inp, u(seed), prefix)

  /** [[hashLongCtes]] with a VARIABLE seed: `seedExpr` is any unsigned-
    * HUGEINT SQL expression over `inp`'s columns (typically the `h` of a
    * previous chain, renamed) — the per-field accumulation of Spark's
    * multi-argument `xxhash64` fold, where each field's hash seeds the
    * next field's. */
  def hashLongCtesExpr(inp: String, seedExpr: String, prefix: String = "rh")
      : (String, String) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def add(name: String, col: String, expr: String, src: String): String = {
      out += s"$name AS MATERIALIZED (SELECT *, $expr AS $col FROM $src)"
      name
    }
    var prev = add(s"${prefix}a", s"${prefix}_s",
      xor(s"((($seedExpr) + ${u(P5 + 8L)}) % $M64)",
        mul64c(rot(mul64c("v", P2), 31), P1)), inp)
    prev = add(s"${prefix}b", s"${prefix}_f0",
      s"(${mul64c(rot(s"${prefix}_s", 27), P1)} + ${u(P4)}) % $M64", prev)
    prev = add(s"${prefix}c", s"${prefix}_f1",
      mul64c(xor(s"${prefix}_f0", s"${prefix}_f0//${pow2(33)}"), P2), prev)
    prev = add(s"${prefix}d", s"${prefix}_f2",
      mul64c(xor(s"${prefix}_f1", s"${prefix}_f1//${pow2(29)}"), P3), prev)
    prev = add(s"${prefix}e", "h",
      xor(s"${prefix}_f2", s"${prefix}_f2//${pow2(32)}"), prev)
    (out.mkString(",\n"), prev)
  }
}

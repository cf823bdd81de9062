package graft.llm

/** Emits DuckDB SQL that reproduces the engine's hash family
  * BIT-FOR-BIT, so the banded-LSH dedup queries get full hash-exact
  * oracles instead of rows-only checks:
  *
  *   - [[xxh64Str]]  — XXH64(utf8 bytes, seed 42), the token hash both
  *     Spark's `xxhash64(...)` SQL function and
  *     [[graft.functions.NGramHashes]] apply per token;
  *   - [[mixAddSigned]] — splitmix64 finalizer of (a + b) mod 2⁶⁴
  *     ([[graft.functions.HashUtil.mix]]; every engine call site is
  *     `mix(x + y)`);
  *   - [[hashLongSigned]] — XXH64.hashLong, Spark's per-element step
  *     for `xxhash64(array<bigint>)` (the LSH band hash).
  *
  * Technique: all arithmetic runs in the unsigned-64 HUGEINT domain
  * [0, 2⁶⁴) — 64-bit wraparound becomes `% 2⁶⁴`, multiplication splits
  * into 32-bit halves so no partial product exceeds HUGEINT range, and
  * an unsigned right-shift is integer division. Signed BIGINT appears
  * only at CTE boundaries, where Spark semantics (array sort order,
  * slot minimum) are over SIGNED longs. Single-element
  * `list_transform([v], g -> body)[1]` lambdas act as let-bindings so
  * each operand is evaluated once and the generated SQL grows linearly
  * with the algorithm, not exponentially with nesting depth.
  *
  * The generated expressions are validated against the Python
  * reference in tools/duckhash_proto.py (kept in sync) and, end to
  * end, by the DuckDB oracle gate itself: a single wrong bit anywhere
  * changes the banding and fails the hash compare.
  */
object DuckHash {

  private val U = BigInt("18446744073709551616") // 2^64
  private val HALF = BigInt("9223372036854775808") // 2^63
  private val MASK = U - 1

  private val P1 = BigInt("9E3779B185EBCA87", 16)
  private val P2 = BigInt("C2B2AE3D27D4EB4F", 16)
  private val P3 = BigInt("165667B19E3779F9", 16)
  private val P4 = BigInt("85EBCA77C2B2AE63", 16)
  private val P5 = BigInt("27D4EB2F165667C5", 16)

  /** Fresh-name counter for let-bindings; unique within any one
    * generated statement (global is fine — names never cross SQL
    * statement boundaries in a harmful way). */
  private var ctr = 0
  private def fresh(): String = synchronized { ctr += 1; s"g$ctr" }

  private val Simple =
    "^[A-Za-z_][A-Za-z0-9_.\\[\\]]*$|^\\d+$|^\\d+::HUGEINT$".r

  /** Let-binding via a one-element lambda: evaluates `v` once under a
    * fresh name. Skipped for identifiers/literals (re-evaluation
    * free), which keeps the hot per-row expressions allocation-lean. */
  private def let(v: String)(body: String => String): String =
    if (Simple.matches(v)) body(v)
    else { val g = fresh(); s"list_transform([$v], $g -> ${body(g)})[1]" }

  private def h(c: BigInt): String = s"$c::HUGEINT"

  private def uadd(a: String, b: String): String = s"(($a) + ($b)) % $U"

  /** (a * b) mod 2⁶⁴ via 32-bit half products (each < 2⁶⁵ ≪ HUGEINT
    * max, so DuckDB's overflow checks never fire). */
  private def umul(a: String, b: String): String =
    let(a) { x => let(b) { y =>
      s"(($x % 4294967296) * ($y % 4294967296) + " +
        s"(($x % 4294967296) * ($y // 4294967296) + " +
        s"($x // 4294967296) * ($y % 4294967296)) % 4294967296 * 4294967296) " +
        s"% $U"
    } }

  private def ushr(a: String, n: Int): String = s"(($a) // ${BigInt(1) << n})"

  private def rotl(a: String, r: Int): String =
    let(a) { x =>
      s"((($x) * ${BigInt(1) << r}) % $U + (($x) // ${BigInt(1) << (64 - r)})) % $U"
    }

  private def uxor(a: String, b: String): String = s"xor($a, $b)"

  private def toU(s: String): String =
    let(s) { x =>
      s"(CASE WHEN $x < 0 THEN ($x)::HUGEINT + $U ELSE ($x)::HUGEINT END)"
    }

  private def toS(u: String): String =
    let(u) { x =>
      s"(CASE WHEN $x >= $HALF THEN ($x - $U)::BIGINT ELSE ($x)::BIGINT END)"
    }

  private def fmix(x: String): String = {
    val s1 = let(x)(v => umul(uxor(v, ushr(v, 33)), h(P2)))
    val s2 = let(s1)(v => umul(uxor(v, ushr(v, 29)), h(P3)))
    let(s2)(v => uxor(v, ushr(v, 32)))
  }

  /** XXH64 round: rotl31(acc + inp·P2)·P1. */
  private def xround(acc: String, inp: String): String =
    umul(rotl(uadd(acc, umul(inp, h(P2))), 31), h(P1))

  /** splitmix64 of (a + b) mod 2⁶⁴ — signed BIGINT in and out. */
  def mixAddSigned(aSigned: String, bSigned: String): String = {
    val z0 = uadd(toU(aSigned), toU(bSigned))
    val z1 = let(uadd(z0, h(BigInt("9E3779B97F4A7C15", 16)))) { z =>
      umul(uxor(z, ushr(z, 30)), h(BigInt("BF58476D1CE4E5B9", 16)))
    }
    val z2 = let(z1)(z => umul(uxor(z, ushr(z, 27)), h(BigInt("94D049BB133111EB", 16))))
    toS(let(z2)(z => uxor(z, ushr(z, 31))))
  }

  /** 0-based byte `o` of hex dump `hx` (both bound names/exprs). */
  private def byteAt(hx: String, o: String): String =
    s"((strpos('0123456789ABCDEF', substring($hx, (2*($o)+1)::INTEGER, 1))-1)*16" +
      s" + strpos('0123456789ABCDEF', substring($hx, (2*($o)+2)::INTEGER, 1))-1)"

  /** Little-endian word of `nbytes` bytes at 0-based offset `o`. */
  private def wordLE(hx: String, o: String, nbytes: Int): String =
    (0 until nbytes).map { k =>
      s"(${byteAt(hx, s"($o)+$k")})::HUGEINT * ${BigInt(1) << (8 * k)}"
    }.mkString("(", " + ", ")")

  /** Full XXH64 of the utf8 bytes of string expression `texpr`, seed
    * 42 — signed BIGINT, equal to Spark's `xxhash64(texpr)`. Handles
    * every length class (4-lane stripes for ≥ 32 bytes, then 8-byte
    * words, one 4-byte word, trailing bytes). */
  def xxh64Str(texpr: String, seed: Long = 42L): String =
    let(texpr) { t =>
      let(s"hex(encode($t))") { hx =>
        let(s"octet_length(encode($t))") { n => xxh64Body(hx, n, seed) }
      }
    }

  private def xxh64Body(hx: String, n: String, seed: Long): String = {
    val sd = BigInt(seed)
    val v1o = (sd + P1 + P2) & MASK
    val v2o = (sd + P2) & MASK
    val v3o = sd & MASK
    val v4o = (sd - P1) & MASK
    def stripeStep(ac: String, s: String): String =
      "{" +
        s"'a': ${xround(ac + ".a", wordLE(hx, s"32*($s)", 8))}, " +
        s"'b': ${xround(ac + ".b", wordLE(hx, s"32*($s)+8", 8))}, " +
        s"'c': ${xround(ac + ".c", wordLE(hx, s"32*($s)+16", 8))}, " +
        s"'d': ${xround(ac + ".d", wordLE(hx, s"32*($s)+24", 8))}" + "}"
    val stripeFold =
      s"list_reduce(list_prepend(" +
        s"{'a': ${h(v1o)}, 'b': ${h(v2o)}, 'c': ${h(v3o)}, 'd': ${h(v4o)}}, " +
        s"list_transform(range(($n // 32)::BIGINT), s -> " +
        s"{'a': s::HUGEINT, 'b': 0::HUGEINT, 'c': 0::HUGEINT, 'd': 0::HUGEINT})), " +
        s"(ac, st) -> ${stripeStep("ac", "st.a")})"
    def merged(stv: String): String = {
      val base = uadd(uadd(rotl(stv + ".a", 1), rotl(stv + ".b", 7)),
        uadd(rotl(stv + ".c", 12), rotl(stv + ".d", 18)))
      val m1 = let(base)(hh => uadd(umul(uxor(hh, xround(h(0), stv + ".a")), h(P1)), h(P4)))
      val m2 = let(m1)(hh => uadd(umul(uxor(hh, xround(h(0), stv + ".b")), h(P1)), h(P4)))
      val m3 = let(m2)(hh => uadd(umul(uxor(hh, xround(h(0), stv + ".c")), h(P1)), h(P4)))
      let(m3)(hh => uadd(umul(uxor(hh, xround(h(0), stv + ".d")), h(P1)), h(P4)))
    }
    val big = let(stripeFold)(merged)
    val small = h((sd + P5) & MASK)
    val acc0 = s"(CASE WHEN $n >= 32 THEN $big ELSE $small END)"
    val acc1 = uadd(acc0, s"($n)::HUGEINT")
    def step8(a: String, w: String): String = {
      val k1 = xround(h(0), wordLE(hx, s"8*($w)", 8))
      let(uxor(a, k1))(hh => uadd(umul(rotl(hh, 27), h(P1)), h(P4)))
    }
    val acc2 = let(acc1) { a =>
      s"list_reduce(list_prepend(($a)::HUGEINT, " +
        s"list_transform(range((4*($n//32))::BIGINT, ($n//8)::BIGINT), x -> x::HUGEINT)), " +
        s"(a, w) -> ${step8("a", "w")})"
    }
    def step4(a: String): String = {
      val k = umul(wordLE(hx, s"8*($n//8)", 4), h(P1))
      let(uxor(a, k))(hh => uadd(umul(rotl(hh, 23), h(P2)), h(P3)))
    }
    val acc3 = let(acc2) { a =>
      s"(CASE WHEN ($n) % 8 >= 4 THEN ${step4(a)} ELSE $a END)"
    }
    def stepB(a: String, o: String): String = {
      val k = umul(s"(${byteAt(hx, o)})::HUGEINT", h(P5))
      let(uxor(a, k))(hh => umul(rotl(hh, 11), h(P1)))
    }
    val start = s"(8*($n//8) + CASE WHEN ($n) % 8 >= 4 THEN 4 ELSE 0 END)"
    val acc4 = let(acc3) { a =>
      s"list_reduce(list_prepend(($a)::HUGEINT, " +
        s"list_transform(range(($start)::BIGINT, ($n)::BIGINT), x -> x::HUGEINT)), " +
        s"(a, o) -> ${stepB("a", "o")})"
    }
    toS(fmix(acc4))
  }

  /** [[xxh64Str]] kept in the unsigned HUGEINT domain — for consumers
    * that go straight into bit extraction (the SimHash bit votes). */
  def xxh64StrUnsigned(texpr: String, seed: Long = 42L): String =
    toU(xxh64Str(texpr, seed))

  /** XXH64.hashLong — Spark's per-element step for
    * `xxhash64(array<bigint>)`. Signed in/out. */
  def hashLongSigned(inpSigned: String, seedSigned: String): String = {
    val a0 = uadd(uadd(toU(seedSigned), h(P5)), h(8))
    val k1 = umul(rotl(umul(toU(inpSigned), h(P2)), 31), h(P1))
    val a1 = let(uxor(a0, k1))(hh => uadd(umul(rotl(hh, 27), h(P1)), h(P4)))
    toS(fmix(a1))
  }

  /** VALUES rows (b, 2^b::HUGEINT, 2^b as signed BIGINT) for b in
    * 0..63 — the bit table the SimHash oracle votes over. b = 63 needs
    * the (-2⁶³ - 1 + 1) spelling because the bare literal 2⁶³ does not
    * parse as BIGINT. */
  def bitTableValues: String =
    (0 until 64).map { b =>
      val p = BigInt(1) << b
      val ps = if (b == 63) "(-9223372036854775807 - 1)" else p.toString
      s"($b, $p::HUGEINT, $ps::BIGINT)"
    }.mkString(", ")
}

"""Prototype of the DuckDB SQL generator for the xxh64/splitmix hash
family (develops the oracle for llm_dedup_minhash / llm_dedup_simhash;
the production generator is graft.llm.DuckHash in Scala — keep in sync).

All arithmetic runs in the unsigned-64 HUGEINT domain [0, 2^64);
signed BIGINT only at CTE boundaries (Spark semantics for sort/min).
Let-bindings via single-element list_transform keep expansion linear.
"""
import re

U = "18446744073709551616"          # 2^64
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
M = (1 << 64) - 1

_ctr = [0]
_SIMPLE = re.compile(r"^[A-Za-z_][A-Za-z0-9_.\[\]]*$|^\d+$|^\d+::HUGEINT$")


def let(val, body):
    """Bind `val` to a fresh name, call body(name). Skips the binding
    for trivially re-evaluable expressions (identifiers, literals)."""
    if _SIMPLE.match(val):
        return body(val)
    _ctr[0] += 1
    v = f"g{_ctr[0]}"
    return f"list_transform([{val}], {v} -> {body(v)})[1]"


def h(c):          # hugeint literal
    return f"{c}::HUGEINT"


def uadd(a, b):
    return f"(({a}) + ({b})) % {U}"


def umul(a, b):
    return let(a, lambda x: let(b, lambda y:
        f"(({x} % 4294967296) * ({y} % 4294967296) + "
        f"(({x} % 4294967296) * ({y} // 4294967296) + "
        f"({x} // 4294967296) * ({y} % 4294967296)) % 4294967296 * 4294967296) "
        f"% {U}"))


def ushr(a, n):
    return f"(({a}) // {1 << n})"


def rotl(a, r):
    return let(a, lambda x:
        f"((({x}) * {1 << r}) % {U} + (({x}) // {1 << (64 - r)})) % {U}")


def uxor(a, b):
    return f"xor({a}, {b})"


def to_u(s):
    return let(s, lambda x:
        f"(CASE WHEN {x} < 0 THEN ({x})::HUGEINT + {U} ELSE ({x})::HUGEINT END)")


def to_s(u):
    return let(u, lambda x:
        f"(CASE WHEN {x} >= 9223372036854775808 THEN ({x} - {U})::BIGINT "
        f"ELSE ({x})::BIGINT END)")


def fmix(x):
    s1 = let(x,  lambda v: umul(uxor(v, ushr(v, 33)), h(P2)))
    s2 = let(s1, lambda v: umul(uxor(v, ushr(v, 29)), h(P3)))
    return let(s2, lambda v: uxor(v, ushr(v, 32)))


def xround(acc, inp):
    return umul(rotl(uadd(acc, umul(inp, h(P2))), 31), h(P1))


# splitmix64 of (a + b) mod 2^64, signed in / signed out
# (graft.functions.HashUtil.mix; call sites are all mix(x + y)).
def mix_add_signed(a_signed, b_signed):
    z0 = uadd(to_u(a_signed), to_u(b_signed))
    z1 = let(uadd(z0, h(0x9E3779B97F4A7C15)), lambda z:
             umul(uxor(z, ushr(z, 30)), h(0xBF58476D1CE4E5B9)))
    z2 = let(z1, lambda z: umul(uxor(z, ushr(z, 27)), h(0x94D049BB133111EB)))
    return to_s(let(z2, lambda z: uxor(z, ushr(z, 31))))


# ---- XXH64 over a string expression, seed 42 (Spark xxhash64) ----------

def byteat(hx, o):
    """0-based byte o of the hex dump `hx` (a bound name)."""
    return (f"((strpos('0123456789ABCDEF', substring({hx}, (2*({o})+1)::INTEGER, 1))-1)*16"
            f" + strpos('0123456789ABCDEF', substring({hx}, (2*({o})+2)::INTEGER, 1))-1)")


def word_le(hx, o, nbytes):
    """Little-endian nbytes word at 0-based byte offset o (o a bound name)."""
    terms = " + ".join(
        f"({byteat(hx, f'({o})+{k}')})::HUGEINT * {1 << (8 * k)}"
        for k in range(nbytes))
    return f"({terms})"


def xxh64_str(texpr, seed=42):
    """SQL (signed BIGINT) for XXH64(utf8 bytes of texpr, seed)."""
    def body(t):
        return let(f"hex(encode({t}))", lambda hx:
               let(f"octet_length(encode({t}))", lambda n:
               _xxh64_body(hx, n, seed)))
    return let(texpr, body)


def _xxh64_body(hx, n, seed):
    # n >= 32: 4-lane stripes folded with a struct accumulator, merged.
    v1o = (seed + P1 + P2) & M
    v2o = (seed + P2) & M
    v3o = seed & M
    v4o = (seed - P1) & M
    stripe_fold = (
        f"list_reduce(list_prepend("
        f"{{'a': {h(v1o)}, 'b': {h(v2o)}, 'c': {h(v3o)}, 'd': {h(v4o)}}}, "
        f"list_transform(range({n} // 32), s -> {{"
        f"'a': " + "0::HUGEINT, 'b': 0::HUGEINT, 'c': 0::HUGEINT, 'd': 0::HUGEINT})), "
        f"(ac, st) -> ac)")  # placeholder; replaced below
    # real stripe fold: needs the stripe index to address bytes
    def stripe_step(ac, s):
        return ("{" +
            f"'a': {xround(ac + '.a', word_le(hx, f'32*({s})', 8))}, " +
            f"'b': {xround(ac + '.b', word_le(hx, f'32*({s})+8', 8))}, " +
            f"'c': {xround(ac + '.c', word_le(hx, f'32*({s})+16', 8))}, " +
            f"'d': {xround(ac + '.d', word_le(hx, f'32*({s})+24', 8))}" + "}")
    stripe_fold = (
        f"list_reduce(list_prepend("
        f"{{'a': {h(v1o)}, 'b': {h(v2o)}, 'c': {h(v3o)}, 'd': {h(v4o)}}}, "
        f"list_transform(range(({n} // 32)::BIGINT), s -> "
        f"{{'a': s::HUGEINT, 'b': 0::HUGEINT, 'c': 0::HUGEINT, 'd': 0::HUGEINT}})), "
        f"(ac, st) -> {stripe_step('ac', 'st.a')})")
    def merged(stv):
        base = uadd(uadd(rotl(stv + ".a", 1), rotl(stv + ".b", 7)),
                    uadd(rotl(stv + ".c", 12), rotl(stv + ".d", 18)))
        m1 = let(base, lambda hh: uadd(umul(uxor(hh, xround(h(0), stv + ".a")), h(P1)), h(P4)))
        m2 = let(m1,  lambda hh: uadd(umul(uxor(hh, xround(h(0), stv + ".b")), h(P1)), h(P4)))
        m3 = let(m2,  lambda hh: uadd(umul(uxor(hh, xround(h(0), stv + ".c")), h(P1)), h(P4)))
        return let(m3, lambda hh: uadd(umul(uxor(hh, xround(h(0), stv + ".d")), h(P1)), h(P4)))
    big = let(stripe_fold, merged)
    small = h((seed + P5) & M)
    acc0 = f"(CASE WHEN {n} >= 32 THEN {big} ELSE {small} END)"
    acc1 = uadd(acc0, f"({n})::HUGEINT")
    # full 8-byte words not consumed by stripes: indices [4*(n//32), n//8)
    def step8(a, w):
        k1 = xround(h(0), word_le(hx, f"8*({w})", 8))
        return let(uxor(a, k1), lambda hh: uadd(umul(rotl(hh, 27), h(P1)), h(P4)))
    acc2 = let(acc1, lambda a:
        f"list_reduce(list_prepend(({a})::HUGEINT, "
        f"list_transform(range((4*({n}//32))::BIGINT, ({n}//8)::BIGINT), x -> x::HUGEINT)), "
        f"(a, w) -> {step8('a', 'w')})")
    # 4-byte word if n%8 >= 4, at offset 8*(n//8)
    def step4(a):
        k = umul(word_le(hx, f"8*({n}//8)", 4), h(P1))
        return let(uxor(a, k), lambda hh: uadd(umul(rotl(hh, 23), h(P2)), h(P3)))
    acc3 = let(acc2, lambda a:
        f"(CASE WHEN ({n}) % 8 >= 4 THEN {step4(a)} ELSE {a} END)")
    # trailing bytes from 8*(n//8) + (4 if n%8>=4 else 0) to n-1
    def stepb(a, o):
        k = umul(f"({byteat(hx, o)})::HUGEINT", h(P5))
        return let(uxor(a, k), lambda hh: umul(rotl(hh, 11), h(P1)))
    start = f"(8*({n}//8) + CASE WHEN ({n}) % 8 >= 4 THEN 4 ELSE 0 END)"
    acc4 = let(acc3, lambda a:
        f"list_reduce(list_prepend(({a})::HUGEINT, "
        f"list_transform(range(({start})::BIGINT, ({n})::BIGINT), x -> x::HUGEINT)), "
        f"(a, o) -> {stepb('a', 'o')})")
    return to_s(fmix(acc4))


# XXH64.hashLong — Spark's per-element step for xxhash64(array<bigint>).
# signed input, signed seed, signed output.
def hash_long_signed(inp_signed, seed_signed):
    a0 = uadd(uadd(to_u(seed_signed), h(P5)), h(8))
    k1 = umul(rotl(umul(to_u(inp_signed), h(P2)), 31), h(P1))
    a1 = let(uxor(a0, k1), lambda hh: uadd(umul(rotl(hh, 27), h(P1)), h(P4)))
    return to_s(fmix(a1))


if __name__ == "__main__":
    import duckdb, sys
    sys.path.insert(0, "/root/repo/tools")
    import xxh64_ref as ref
    con = duckdb.connect()
    import random
    random.seed(7)
    # strings across every length class incl. >=32 and multi-byte utf8
    cases = ["", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
             "hello world", "héllo wörld", "x" * 31, "y" * 32, "z" * 33,
             "The quick brown fox jumps over the lazy dog — ünïcödé!",
             "w" * 100] + ["".join(random.choice("abcdefgh ") for _ in range(random.randint(0, 80))) for _ in range(60)]
    expr = xxh64_str("t")
    print("xxh64 expr bytes:", len(expr))
    got = con.execute(
        f"SELECT t, {expr} FROM (SELECT unnest(?) AS t)", [cases]).fetchall()
    bad = 0
    for t, g in got:
        want = ref.to_signed(ref.xxh64(t.encode("utf-8"), 42))
        if g != want:
            bad += 1
            print("MISMATCH", repr(t), g, want)
    print(f"xxh64_str: {len(cases) - bad}/{len(cases)} ok")

    # hashLong chain vs spark array hash ground truth
    hl = hash_long_signed("x", "s")
    r = con.execute(
        f"SELECT list_reduce(list_prepend(42::BIGINT, [1234567890123::BIGINT, -987654321]), (s, x) -> {hl})").fetchall()
    print("hashLong chain:", r[0][0], r[0][0] == 984076011732663720)

    # mix_add vs reference splitmix
    mx = mix_add_signed("a", "b")
    pairs = [(5871781006564002453, -4367754540140381902), (0, 0), (-1, -1),
             (9223372036854775807, 63), (-9223372036854775808, 1)]
    for a, b in pairs:
        g = con.execute(f"SELECT {mx} FROM (SELECT ?::BIGINT AS a, ?::BIGINT AS b)", [a, b]).fetchall()[0][0]
        want = ref.to_signed(ref.splitmix((a + b) % (1 << 64)))
        if g != want:
            print("MIX MISMATCH", a, b, g, want)
    print("mix_add ok")


# ---- full oracle assembly (prototype of the Scala TextOps oracles) -----

AUG_NEAR = """aug AS (
  SELECT doc_id, lang, source, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, lang, source,
    array_to_string(string_split(text, ' ')[1:len(string_split(text, ' ')) - 1], ' ')
  FROM documents WHERE doc_id % 10 = 0)"""

TRI_SEED = 0x517CC1B727220A95  # NGramHashes chain seed (positive as signed)


def minhash_oracle_sql():
    tri = mix_add_signed(
        mix_add_signed(mix_add_signed(f"{TRI_SEED}::BIGINT", "ths[i]"), "ths[i+1]"),
        "ths[i+2]")
    slot_val = mix_add_signed("sh", "slot")
    band_step = hash_long_signed("x", "s")
    return f"""WITH {AUG_NEAR},
tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM aug
        WHERE len(string_split(text, ' ')) >= 3),
tpos AS (SELECT doc_id, unnest(generate_series(1, len(toks))) AS pos, toks FROM tok),
th AS (SELECT doc_id, pos, {xxh64_str('toks[pos]')} AS h FROM tpos),
thl AS (SELECT doc_id, list(h ORDER BY pos) AS ths FROM th GROUP BY doc_id),
tri AS (SELECT doc_id, unnest(generate_series(1, len(ths) - 2)) AS i, ths FROM thl),
shd AS (SELECT DISTINCT doc_id, {tri} AS sh FROM tri),
slot AS (SELECT doc_id, sl.slot AS slot, min({slot_val}) AS m
         FROM shd CROSS JOIN (SELECT unnest(generate_series(0::BIGINT, 63)) AS slot) sl
         GROUP BY doc_id, sl.slot),
sig AS (SELECT doc_id, list(m ORDER BY slot) AS sig FROM slot GROUP BY doc_id),
bnd AS (SELECT doc_id, unnest(generate_series(0, 7)) AS band, sig FROM sig),
bh AS (SELECT doc_id, band,
         list_reduce(list_prepend(42::BIGINT, sig[band * 8 + 1 : band * 8 + 8]),
           (s, x) -> {band_step}) AS bh
       FROM bnd),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bh a JOIN bh b ON a.band = b.band AND a.bh = b.bh
         WHERE a.doc_id < b.doc_id),
sets AS (SELECT doc_id, list(sh) AS shs FROM shd GROUP BY doc_id),
ver AS (SELECT doc_a, doc_b, len(list_intersect(sa.shs, sb.shs)) AS inter,
          len(sa.shs) AS la, len(sb.shs) AS lb
        FROM cand JOIN sets sa ON sa.doc_id = cand.doc_a
                  JOIN sets sb ON sb.doc_id = cand.doc_b)
SELECT doc_a, doc_b,
  round(CAST(inter AS DOUBLE) / (la + lb - inter), 4) AS j
FROM ver
WHERE round(CAST(inter AS DOUBLE) / (la + lb - inter), 4) >= 0.5
ORDER BY doc_a, doc_b"""


def simhash_oracle_sql():
    rows = []
    for b in range(64):
        p = 1 << b
        ps = "(-9223372036854775807 - 1)" if b == 63 else str(p)
        rows.append(f"({b}, {p}::HUGEINT, {ps}::BIGINT)")
    vals = ", ".join(rows)
    return f"""WITH {AUG_NEAR},
tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM aug),
tpos AS (SELECT doc_id, unnest(generate_series(1, len(toks))) AS pos, toks FROM tok),
th AS (SELECT doc_id, {to_u(xxh64_str('toks[pos]'))} AS hu FROM tpos),
bits AS (SELECT doc_id, bs.b AS b, max(bs.p) AS p,
           sum(CASE WHEN (hu // bs.pu) % 2 = 1 THEN 1 ELSE -1 END) AS vote
         FROM th CROSS JOIN (VALUES {vals}) bs(b, pu, p)
         GROUP BY doc_id, bs.b),
sig AS (SELECT doc_id, bit_or(CASE WHEN vote > 0 THEN p ELSE 0 END) AS sim
        FROM bits GROUP BY doc_id),
pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            CAST(bit_count(xor(a.sim, b.sim)) AS INTEGER) AS hamming
          FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 6
ORDER BY doc_a, doc_b"""

#!/usr/bin/env python3
"""Three-implementation check of the signature chains.

The engine's sketch queries key on a chain of published primitives —
FNV-1a token hashes, rolling n-gram folds, the splitmix64 finalizer,
LCG MinHash permutations, FNV band folds, SimHash majority votes
(GraftExpressions.scala) — and the DuckDB oracles reproduce that chain
bit-exactly. Both encodings are same-author, though: a shared
misunderstanding in the chain design would pass both sides of every
oracle gate. This script is the third, independent encoding — plain
Python big-int arithmetic, written from the PUBLISHED definitions of
the primitives — checked value-for-value against

  (a) the engine's own output (graft.ChainDump parquet), and
  (b) a DuckDB HUGEINT re-encoding built here from Python-derived
      permutation constants,

on a sampled doc cohort. Three languages agreeing on every stage
(fingerprint, token hashes, 3/5-gram shingles, 64-slot signature,
16 band hashes, simhash) turns "two copies of one design agree" into
"three independent encodings agree".

Usage:
  python3 tools/chain_check.py <sfDir> <chainDumpParquet> [mod=50]
"""
import sys

M = 1 << 64
MASK = M - 1
GOLDEN = 0x9E3779B97F4A7C15
FNV_OFFSET = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3
BIAS = 1 << 63
LONG_MAX = (1 << 63) - 1


def mix(z):
    """splitmix64 finalizer (public constants)."""
    z = (z + GOLDEN) & MASK
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK
    return z ^ (z >> 31)


def fnv1a(data):
    h = FNV_OFFSET
    for b in data:
        h = ((h ^ b) * FNV_PRIME) & MASK
    return h


WS = {0x20, 0x09, 0x0A, 0x0B, 0x0C, 0x0D}


def token_hashes(text):
    """FNV-1a per whitespace token over the UTF-8 bytes of
    lower(trim(text)) — whitespace = space or 0x09..0x0d."""
    out, cur, in_tok = [], FNV_OFFSET, False
    for b in text.strip(" ").lower().encode("utf-8"):
        if b in WS:
            if in_tok:
                out.append(cur)
                in_tok = False
        else:
            if not in_tok:
                cur, in_tok = FNV_OFFSET, True
            cur = ((cur ^ b) * FNV_PRIME) & MASK
    if in_tok:
        out.append(cur)
    return out


def shingles(tkh, n):
    """Rolling n-gram FNV fold + splitmix finalizer, dedup keep-first."""
    out, seen = [], set()
    for i in range(len(tkh) - n + 1):
        h = GOLDEN
        for j in range(n):
            h = ((h ^ tkh[i + j]) * FNV_PRIME) & MASK
        h = mix(h)
        if h not in seen:
            seen.add(h)
            out.append(h)
    return out


# LCG permutation constants — same public splitmix64 derivation the
# engine documents (a_i = mix(2i+1)|1, b_i = mix(2i+2))
PERM_A = [mix(2 * i + 1) | 1 for i in range(64)]
PERM_B = [mix(2 * i + 2) for i in range(64)]


def signed(u):
    return u - M if u >= BIAS else u


def minhash_sig(sh, k=64):
    """k minima of (a·x+b mod 2^64), compared as SIGNED 64-bit."""
    out = []
    for i in range(k):
        a, b = PERM_A[i], PERM_B[i]
        best = LONG_MAX
        for x in sh:
            h = signed((a * x + b) & MASK)
            if h < best:
                best = h
        out.append(best)
    return out


def band_hashes(sig, bands=16):
    """Per band: FNV fold of its signature slots, then mix."""
    r = len(sig) // bands
    out = []
    for b in range(bands):
        h = GOLDEN ^ b
        for j in range(r):
            h = ((h ^ (sig[b * r + j] & MASK)) * FNV_PRIME) & MASK
        out.append(signed(mix(h)))
    return out


def simhash(tkh):
    out = 0
    for b in range(64):
        votes = sum(1 if (h >> b) & 1 else -1 for h in tkh)
        if votes > 0:
            out |= 1 << b
    return signed(out)


# ---------------------------------------------------------------- DuckDB

def duckdb_chain_sql(mod):
    """DuckDB HUGEINT re-encoding of the chain (fingerprint, token
    hashes, 3-gram shingles, signature, band hashes) with the
    permutation table supplied from THIS script's derivation."""
    c1, c2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB

    def mix_sql(inner):
        return (
            "list_transform(list_transform(list_transform(list_transform("
            f"{inner}, z -> (z + {GOLDEN}::HUGEINT) % {M}::HUGEINT),"
            f" z -> ({c1 >> 32}::HUGEINT * ((xor(z, z // 1073741824) % 4294967296) * 4294967296)"
            f" + {c1 & 0xFFFFFFFF}::HUGEINT * xor(z, z // 1073741824)) % {M}::HUGEINT),"
            f" z -> ({c2 >> 32}::HUGEINT * ((xor(z, z // 134217728) % 4294967296) * 4294967296)"
            f" + {c2 & 0xFFFFFFFF}::HUGEINT * xor(z, z // 134217728)) % {M}::HUGEINT),"
            " z -> xor(z, z // 2147483648))")

    perm_rows = ",".join(
        f"({i + 1},{PERM_A[i] >> 32},{PERM_A[i] & 0xFFFFFFFF},{PERM_B[i]})"
        for i in range(64))
    band_seeds = ",".join(f"({b + 1},{GOLDEN ^ b})" for b in range(16))
    fold3 = (f"(xor((xor((xor({GOLDEN}::HUGEINT, tkh[i]) * {FNV_PRIME}) % {M}::HUGEINT,"
             f" tkh[i+1]) * {FNV_PRIME}) % {M}::HUGEINT,"
             f" tkh[i+2]) * {FNV_PRIME}) % {M}::HUGEINT")
    return f"""
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % {mod} = 0
), fp AS (
  SELECT doc_id, list_reduce(
    list_prepend({FNV_OFFSET}::HUGEINT,
      list_transform(generate_series(1, octet_length(encode(text))),
        i -> CAST(CAST('0x' || substr(hex(encode(text)), 2*i-1, 2) AS INTEGER) AS HUGEINT))),
    (acc, b) -> (xor(acc, b) * {FNV_PRIME}) % {M}::HUGEINT) AS fingerprint
  FROM docs
), toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
    t -> len(t) > 0) AS tk
  FROM docs
), th AS (
  SELECT doc_id, list_transform(tk, t -> list_reduce(
    list_prepend({FNV_OFFSET}::HUGEINT,
      list_transform(generate_series(1, octet_length(encode(t))),
        i -> CAST(CAST('0x' || substr(hex(encode(t)), 2*i-1, 2) AS INTEGER) AS HUGEINT))),
    (acc, b) -> (xor(acc, b) * {FNV_PRIME}) % {M}::HUGEINT)) AS tkh
  FROM toks
), shr AS (
  SELECT doc_id,
    CASE WHEN len(tkh) >= 3 THEN {mix_sql(
        f"list_transform(generate_series(1, len(tkh) - 2), i -> {fold3})")}
         ELSE [] END AS sh
  FROM th
), shl AS (
  -- dedup keep-first (the engine's ShingleHashes order)
  SELECT doc_id, list_filter(sh, (x, i) -> list_position(sh, x) = i) AS sh3
  FROM shr
), perms(i, a_hi, a_lo, b) AS (VALUES {perm_rows}),
sigslots AS (
  SELECT s.doc_id, p.i AS slot,
    coalesce(
      (min((p.a_hi::HUGEINT * ((u.s % 4294967296) * 4294967296)
            + p.a_lo::HUGEINT * u.s + p.b::HUGEINT
            + {BIAS}::HUGEINT) % {M}::HUGEINT)
       + {BIAS}::HUGEINT) % {M}::HUGEINT,
      {LONG_MAX}::HUGEINT) AS hval
  FROM shl s
  CROSS JOIN perms p
  LEFT JOIN (SELECT doc_id, unnest(list_distinct(sh3)) AS s FROM shl) u
    USING (doc_id)
  GROUP BY s.doc_id, p.i
), sigs AS (
  SELECT doc_id, list(hval ORDER BY slot) AS sig FROM sigslots GROUP BY doc_id
), bandseeds(band, seed) AS (VALUES {band_seeds}),
bandvals AS (
  SELECT g.doc_id, b.band,
    {mix_sql("[list_reduce(list_prepend(b.seed::HUGEINT, sig[(b.band-1)*4+1 : (b.band-1)*4+4]), (acc, s) -> (xor(acc, s) * " + str(FNV_PRIME) + ") % " + str(M) + "::HUGEINT)]")}[1] AS bh
  FROM sigs g CROSS JOIN bandseeds b
), bands AS (
  SELECT doc_id, list(bh ORDER BY band) AS band_hashes FROM bandvals GROUP BY doc_id
)
SELECT d.doc_id, f.fingerprint, t.tkh, s.sh3, g.sig, b.band_hashes
FROM docs d
JOIN fp f USING (doc_id) JOIN th t USING (doc_id)
JOIN shl s USING (doc_id) JOIN sigs g USING (doc_id)
JOIN bands b USING (doc_id)
ORDER BY d.doc_id
"""


def u64(v):
    return int(v) & MASK


def main(argv):
    import duckdb
    sf_dir = argv[1]
    dump = argv[2]
    mod = int(argv[3]) if len(argv) > 3 else 50
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    rows = con.execute(
        f"SELECT * FROM read_parquet('{dump}/*.parquet') ORDER BY doc_id"
    ).fetchall()
    cols = [d[0] for d in con.execute(
        f"SELECT * FROM read_parquet('{dump}/*.parquet') LIMIT 0").description]
    texts = dict(con.execute(
        f"SELECT doc_id, text FROM documents WHERE doc_id % {mod} = 0"
    ).fetchall())
    assert len(rows) == len(texts) and len(rows) > 0, \
        f"cohort mismatch: dump {len(rows)} vs table {len(texts)}"
    idx = {c: i for i, c in enumerate(cols)}
    stages = ["fingerprint", "token_hashes", "sh3", "sh5", "minhash_sig",
              "band_hashes", "simhash"]
    mismatches = {s: 0 for s in stages}

    # --- Python vs Scala (engine dump), every stage
    for r in rows:
        doc_id = r[idx["doc_id"]]
        text = texts[doc_id]
        tkh = token_hashes(text)
        sh3, sh5 = shingles(tkh, 3), shingles(tkh, 5)
        sig = minhash_sig(sh3)
        py = {
            "fingerprint": signed(fnv1a(text.encode("utf-8"))),
            "token_hashes": [signed(h) for h in tkh],
            "sh3": [signed(h) for h in sh3],
            "sh5": [signed(h) for h in sh5],
            "minhash_sig": sig,
            "band_hashes": band_hashes(sig),
            "simhash": simhash(tkh),
        }
        for s in stages:
            got = r[idx[s]]
            got = list(got) if isinstance(got, (list, tuple)) else got
            if got != py[s]:
                if mismatches[s] == 0:
                    print(f"[py-vs-scala] FIRST MISMATCH {s} doc {doc_id}:"
                          f" scala={str(got)[:120]} py={str(py[s])[:120]}")
                mismatches[s] += 1

    # --- Python vs DuckDB (HUGEINT chain from this script's constants)
    ddb = con.execute(duckdb_chain_sql(mod)).fetchall()
    ddb_stages = ["fingerprint", "token_hashes", "sh3", "minhash_sig",
                  "band_hashes"]
    ddb_bad = {s: 0 for s in ddb_stages}
    for row in ddb:
        doc_id = row[0]
        text = texts[doc_id]
        tkh = token_hashes(text)
        sh3 = shingles(tkh, 3)
        sig = minhash_sig(sh3)
        py_u = {
            "fingerprint": fnv1a(text.encode("utf-8")),
            "token_hashes": tkh,
            "sh3": sh3,
            "minhash_sig": [h & MASK for h in sig],
            "band_hashes": [h & MASK for h in band_hashes(sig)],
        }
        vals = dict(zip(["fingerprint", "token_hashes", "sh3",
                         "minhash_sig", "band_hashes"], row[1:]))
        for s in ddb_stages:
            got = vals[s]
            got = ([u64(v) for v in got] if isinstance(got, (list, tuple))
                   else u64(got))
            if got != py_u[s]:
                if ddb_bad[s] == 0:
                    print(f"[py-vs-duckdb] FIRST MISMATCH {s} doc {doc_id}:"
                          f" duckdb={str(got)[:120]} py={str(py_u[s])[:120]}")
                ddb_bad[s] += 1

    n = len(rows)
    print(f"[chain-check] cohort = {n} docs (doc_id % {mod} == 0)")
    ok = True
    for s in stages:
        status = "OK" if mismatches[s] == 0 else f"{mismatches[s]} MISMATCH"
        ok = ok and mismatches[s] == 0
        print(f"  py-vs-scala  {s:>13}: {status}")
    for s in ddb_stages:
        status = "OK" if ddb_bad[s] == 0 else f"{ddb_bad[s]} MISMATCH"
        ok = ok and ddb_bad[s] == 0
        print(f"  py-vs-duckdb {s:>13}: {status}")
    print(f"== chain_check {'PASS' if ok else 'FAIL'} ==")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv))

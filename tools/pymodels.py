"""Pure-Python reference models for the seeded-hash dedup operators.

DuckDB cannot mirror Spark's ``xxhash64``, so ``minhash_pairs`` /
``simhash_pairs`` were stuck at rows-only driver checks. These models
recompute the SAME math independently — an XXH64 implementation from the
public xxHash specification (https://github.com/Cyan4973/xxHash, spec in
doc/xxhash_spec.md), the same seeded affine permutations, banding, and
verification — so ``tools/check_oracles.py`` can record a real
rows/schema/hash verdict for them locally. Nothing here imports the
Spark implementation: any shared bug would have to be re-invented.

Numpy vectorizes the per-doc signature folds; everything fits uint64
(a, c < 2^31 so a*c + b < 2^63)."""

from __future__ import annotations

import random

import numpy as np

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, val: int) -> int:
    acc = (acc + val * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M64


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 per the public spec; returns Spark's SIGNED 64-bit value
    (Spark's xxhash64 default seed is 42)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def _char_shingles(text: str, n: int = 5) -> list[str]:
    """Distinct char n-grams, pipeline/dedup.char_shingles semantics:
    positions 1..max(len-n+1, 1), substring may run short at the end of
    short texts; empty text yields the empty shingle."""
    limit = max(len(text) - n + 1, 1)
    seen: dict[str, None] = {}
    for i in range(limit):
        seen.setdefault(text[i : i + n], None)
    return list(seen)


def _load_docs(sf_dir: str, max_id: int = 250) -> list[tuple[int, str]]:
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        f"WHERE doc_id < {max_id} ORDER BY doc_id"
    ).fetchall()
    con.close()
    return [(int(i), t if t is not None else "") for i, t in rows]


def minhash_pairs_model(
    sf_dir: str,
    *,
    n: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
) -> tuple[list[str], list[tuple]]:
    """Expected output of q_minhash_pairs (pair_mode='all'): LSH band
    candidates verified by exact shingle Jaccard."""
    mersenne = (1 << 61) - 1
    rng = random.Random(seed)
    a = np.array(
        [rng.randrange(1, mersenne) % (1 << 31) for _ in range(num_hashes)],
        dtype=np.uint64,
    )
    b = np.array(
        [rng.randrange(0, mersenne) % (1 << 31) for _ in range(num_hashes)],
        dtype=np.uint64,
    )
    docs = _load_docs(sf_dir)
    hash_cache: dict[str, int] = {}
    shingle_sets: dict[int, set[str]] = {}
    sigs: dict[int, tuple[int, ...]] = {}
    for doc_id, text in docs:
        sh = _char_shingles(text, n)
        shingle_sets[doc_id] = set(sh)
        cs = np.empty(len(sh), dtype=np.uint64)
        for j, s in enumerate(sh):
            h = hash_cache.get(s)
            if h is None:
                h = xxh64(s.encode("utf-8")) % (1 << 31)  # pmod fold
                hash_cache[s] = h
            cs[j] = h
        vals = (a[None, :] * cs[:, None] + b[None, :]) % np.uint64(mersenne)
        sigs[doc_id] = tuple(int(x) for x in vals.min(axis=0))
    rows_per_band = num_hashes // bands
    buckets: dict[tuple, list[int]] = {}
    for doc_id, sig in sigs.items():
        for bi in range(bands):
            key = (bi, sig[bi * rows_per_band : (bi + 1) * rows_per_band])
            buckets.setdefault(key, []).append(doc_id)
    cands = set()
    for members in buckets.values():
        members.sort()
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                cands.add((members[x], members[y]))
    out = []
    for id_a, id_b in sorted(cands):
        sa, sb = shingle_sets[id_a], shingle_sets[id_b]
        inter = len(sa & sb)
        j = inter / (len(sa) + len(sb) - inter)
        if j >= threshold:
            out.append((id_a, id_b, round(j, 6)))
    return ["id_a", "id_b", "jaccard"], out


def simhash_pairs_model(
    sf_dir: str, *, n: int = 5, max_hamming: int = 3
) -> tuple[list[str], list[tuple]]:
    """Expected output of q_simhash_pairs (pair_mode='all'): 4x16-bit
    band candidates filtered by exact Hamming distance."""
    docs = _load_docs(sf_dir)
    hash_cache: dict[str, int] = {}
    sigs: dict[int, int] = {}
    for doc_id, text in docs:
        counts = [0] * 64
        for s in _char_shingles(text, n):
            h = hash_cache.get(s)
            if h is None:
                h = xxh64(s.encode("utf-8")) & _M64  # unsigned view
                hash_cache[s] = h
            for k in range(64):
                counts[k] += 1 if (h >> k) & 1 else -1
        sig = 0
        for k in range(64):
            if counts[k] > 0:
                sig |= 1 << k
        sigs[doc_id] = sig  # unsigned view; Hamming is sign-agnostic
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, sig in sigs.items():
        for i in range(4):
            buckets.setdefault(
                (i, (sig >> (i * 16)) & 0xFFFF), []
            ).append(doc_id)
    cands = set()
    for members in buckets.values():
        members.sort()
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                cands.add((members[x], members[y]))
    out = []
    for id_a, id_b in sorted(cands):
        hd = bin(sigs[id_a] ^ sigs[id_b]).count("1")
        if hd <= max_hamming:
            out.append((id_a, id_b, hd))
    return ["id_a", "id_b", "hamming"], out


#: Registry consumed by tools/check_oracles.py: queries DuckDB cannot
#: mirror but a pure-Python model can.
PY_MODELS = {
    "minhash_pairs": minhash_pairs_model,
    "simhash_pairs": simhash_pairs_model,
}

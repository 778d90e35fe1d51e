"""Hash families for dedup / similarity (training-data ops).

All deterministic (fixed parameter tables derived from a seed constant —
no runtime RNG), vectorized over batches with numpy where the shape allows.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE = (1 << 61) - 1
_SEED = 42


def _hash_params(k: int) -> tuple[np.ndarray, np.ndarray]:
    """k deterministic (a, b) pairs for universal hashing ax+b mod p."""
    rng = np.random.RandomState(_SEED)
    a = rng.randint(1, _MERSENNE, size=k, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=k, dtype=np.int64)
    return a, b


def shingles(text: str, width: int = 5) -> np.ndarray:
    """Word w-shingles hashed to int64: first 8 bytes (big-endian) of
    md5(gram), masked to 63 bits. md5 (not blake2b) so the DuckDB oracle
    twins can replicate the value bit-for-bit:
    ``('0x' || substr(md5(g), 1, 16))::UBIGINT % 2**63``."""
    words = text.split()
    if len(words) < width:
        grams = [" ".join(words)] if words else [""]
    else:
        grams = [" ".join(words[i : i + width]) for i in range(len(words) - width + 1)]
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        out[i] = int.from_bytes(
            hashlib.md5(g.encode("utf-8")).digest()[:8], "big"
        )
    return out.astype(np.int64) & np.int64(0x7FFFFFFFFFFFFFFF)


def char_ngrams(text: str, n: int = 5) -> set[int]:
    """Character n-gram hash set (for n-gram Jaccard)."""
    if len(text) < n:
        return {hash_bytes(text.encode("utf-8"))}
    return {hash_bytes(text[i : i + n].encode("utf-8")) for i in range(len(text) - n + 1)}


def hash_bytes(data: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "big") & 0x7FFFFFFFFFFFFFFF


def minhash_signature(shingle_hashes: np.ndarray, num_perm: int = 64) -> np.ndarray:
    """num_perm minhash values over the shingle set, one splitmix64-style
    mix per permutation: h_i(x) = mix(x ^ seed_i). Pure uint64 numpy
    (wrapping arithmetic) — the previous exact ax+b mod (2^61-1) family
    needed python-object bigints and was ~50x slower; min-of-independent-
    hashes only needs a uniform family, not a prime-field one."""
    if len(shingle_hashes) == 0:
        return np.full(num_perm, np.iinfo(np.int64).max, dtype=np.int64)
    seeds = _mix_seeds(num_perm)
    with np.errstate(over="ignore"):
        v = shingle_hashes.astype(np.uint64)[None, :] ^ seeds[:, None]
        v ^= v >> np.uint64(30)
        v *= np.uint64(0xBF58476D1CE4E5B9)
        v ^= v >> np.uint64(27)
        v *= np.uint64(0x94D049BB133111EB)
        v ^= v >> np.uint64(31)
    return (v.min(axis=1) >> np.uint64(1)).astype(np.int64)


def _mix_seeds(k: int) -> np.ndarray:
    rng = np.random.RandomState(_SEED)
    return rng.randint(0, 1 << 62, size=k, dtype=np.int64).astype(np.uint64)


def minhash_signature_batch(texts: list[str], num_perm: int = 64,
                            shingle_width: int = 5) -> np.ndarray:
    """(len(texts), num_perm) int64 signature matrix."""
    out = np.empty((len(texts), num_perm), dtype=np.int64)
    for i, t in enumerate(texts):
        out[i] = minhash_signature(shingles(t, shingle_width), num_perm)
    return out


def lsh_band_keys(sig: np.ndarray, bands: int = 16) -> list[tuple[int, str]]:
    """Split a signature into ``bands`` bands; key = (band_id, band_hash)
    where band_hash = md5 hex of the band's sig values comma-joined in
    permutation order. Docs sharing any band key are near-dup candidates.
    DuckDB twin: ``md5(string_agg(sig::VARCHAR, ',' ORDER BY perm))``."""
    num_perm = len(sig)
    rows = num_perm // bands
    keys = []
    for b in range(bands):
        chunk = sig[b * rows : (b + 1) * rows]
        h = hashlib.md5(",".join(str(int(v)) for v in chunk).encode()).hexdigest()
        keys.append((b, h))
    return keys


# splitmix64 constants + seeds, exported so the DuckDB oracle twin can
# inline the identical mixing pipeline (wrapping multiplies emulated with
# 32-bit splits over HUGEINT — see textops.minhash_sig_sql).
MIX_C1 = 0xBF58476D1CE4E5B9
MIX_C2 = 0x94D049BB133111EB


def mix_seeds(k: int) -> np.ndarray:
    """Public alias of the deterministic per-permutation seed table."""
    return _mix_seeds(k)


def simhash(text: str, bits: int = 64) -> int:
    """SimHash over word-shingle hashes: weighted bit-vote fingerprint."""
    hs = shingles(text, width=2)
    if len(hs) == 0:
        return 0
    votes = np.zeros(bits, dtype=np.int64)
    arr = hs.astype(np.uint64)
    for bit in range(bits):
        bitvals = (arr >> np.uint64(bit)) & np.uint64(1)
        votes[bit] = int(bitvals.sum()) * 2 - len(arr)
    out = 0
    for bit in range(bits):
        if votes[bit] > 0:
            out |= 1 << bit
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 input (the same mixing
    pipeline tiles._hll_partial inlines; exported for the sampling /
    sketch stages whose DuckDB twins replay it via 32-bit-split wrapping
    multiplies — textops._mulw_sql)."""
    v = np.asarray(x, dtype=np.uint64).copy()
    with np.errstate(over="ignore"):
        v *= np.uint64(0x9E3779B97F4A7C15)
        v ^= v >> np.uint64(30)
        v *= np.uint64(MIX_C1)
        v ^= v >> np.uint64(27)
        v *= np.uint64(MIX_C2)
        v ^= v >> np.uint64(31)
    return v

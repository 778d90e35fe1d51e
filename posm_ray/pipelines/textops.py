"""Text-analysis + dedup pipelines over the documents corpus.

``noisy_documents`` injects deterministic exact and near duplicates into the
(all-distinct) driver corpus so the dedup operators have real work; the
injection is SQL-expressible, so exact dedup stays oracle-checked.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import text as textfn
from ..stages import dedup as dedup_stage

EXACT_DUP_MOD = 7       # doc_id % 7 == 0 -> exact copy at doc_id + 1_000_000
NEAR_DUP_MOD = 11       # doc_id % 11 == 0 -> near copy at doc_id + 2_000_000
NEAR_DUP_SUFFIX = " near duplicate marker"


def noisy_documents(sf_dir: str):
    """documents + injected duplicates as one streaming Dataset.

    ONE read + in-batch explode (each block emits base rows plus its own
    exact/near duplicate rows) — the previous 3-read ``union`` paid the
    read+operator overhead three times and fragmented the stream
    (measured: 6.9 s to stream 6.2k rows at 32 CPUs, ~2 s this way)."""
    import ray.data as rd

    base = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"])

    def explode(batch: pa.Table) -> pa.Table:
        did_np = batch.column("doc_id").to_numpy(zero_copy_only=False)
        exact = batch.filter(pa.array(did_np % EXACT_DUP_MOD == 0))
        exact = pa.table({
            "doc_id": pc.add(exact["doc_id"],
                             pa.scalar(1_000_000, pa.int64())),
            "text": exact["text"],
            "lang": exact["lang"],
        })
        near = batch.filter(pa.array(did_np % NEAR_DUP_MOD == 0))
        near = pa.table({
            "doc_id": pc.add(near["doc_id"],
                             pa.scalar(2_000_000, pa.int64())),
            "text": pc.binary_join_element_wise(
                near["text"], pa.scalar(NEAR_DUP_SUFFIX), ""),
            "lang": near["lang"],
        })
        return pa.concat_tables([batch, exact, near])

    return base.map_batches(explode, batch_format="pyarrow")


NOISY_DOCUMENTS_SQL = f"""
SELECT doc_id, text, lang FROM documents
UNION ALL
SELECT doc_id + 1000000 AS doc_id, text, lang FROM documents WHERE doc_id % {EXACT_DUP_MOD} = 0
UNION ALL
SELECT doc_id + 2000000 AS doc_id, text || '{NEAR_DUP_SUFFIX}' AS text, lang
FROM documents WHERE doc_id % {NEAR_DUP_MOD} = 0
"""


def dedup_exact_winners(sf_dir: str):
    """(content_hash, keep_id): min doc_id per distinct text over the noisy
    corpus — hash-partitioned exact dedup."""
    return dedup_stage.dedup_exact(noisy_documents(sf_dir))


DEDUP_EXACT_SQL = f"""
SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id
FROM ({NOISY_DOCUMENTS_SQL}) GROUP BY md5(text)
"""


def dedup_exact_surviving(sf_dir: str):
    """Surviving full rows of the noisy corpus after exact dedup —
    hash-partitioned min-id winner per content hash (dedup.dedup_exact_rows;
    exact QUALIFY oracle twin)."""
    return dedup_stage.dedup_exact_rows(noisy_documents(sf_dir))


DEDUP_EXACT_ROWS_SQL = f"""
SELECT doc_id, text, lang FROM ({NOISY_DOCUMENTS_SQL})
QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY md5(text))
"""


def token_counts(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array([textfn.token_count(t) for t in texts],
                                 pa.int64()),
            "n_bpe_ish": pa.array([textfn.bpe_ish_token_count(t) for t in texts],
                                  pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


TOKEN_COUNTS_SQL = r"""
SELECT doc_id,
       len(list_filter(str_split(text, ' '), x -> x <> ''))::BIGINT AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|\d+|[^\sA-Za-z\d]'))::BIGINT AS n_bpe_ish
FROM documents
"""


def quality_scores(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        rows = [textfn.quality_metrics(t) for t in texts]
        out = {"doc_id": batch["doc_id"]}
        for k in ("n_chars", "n_punct", "n_upper", "n_digit", "n_spaces"):
            out[k] = pa.array([r[k] for r in rows], pa.int64())
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow")


QUALITY_SCORES_SQL = r"""
SELECT doc_id,
       length(text)::BIGINT AS n_chars,
       (length(text) - length(regexp_replace(text, '[.,;:!?''"()\[\]{}-]', '', 'g')))::BIGINT AS n_punct,
       (length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))::BIGINT AS n_upper,
       (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::BIGINT AS n_digit,
       (length(text) - length(replace(text, ' ', '')))::BIGINT AS n_spaces
FROM documents
"""


def fingerprints(sf_dir: str):
    """(doc_id, content_hash) md5 fingerprint — oracle: md5(text)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table({
            "doc_id": batch["doc_id"],
            "content_hash": pa.array([textfn.fingerprint_md5(t) for t in texts],
                                     pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


FINGERPRINTS_SQL = "SELECT doc_id, md5(text) AS content_hash FROM documents"


def lang_quality(sf_dir: str):
    """Language id + stopword hits. The marker-count heuristic is exact
    integer arithmetic over string counts, so it IS oracle-checked
    (LANG_QUALITY_SQL mirrors the non-overlapping count via replace()); the
    rolling-hash fingerprint lives in ``rolling_fingerprints`` (rows-only)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        pred = [textfn.lang_id(t) for t in texts]
        hits = [textfn.stopword_hits(t) for t in texts]
        return pa.table({
            "doc_id": batch["doc_id"],
            "lang": batch["lang"],
            "lang_pred": pa.array(pred, pa.string()),
            "stop_hits": pa.array(hits, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def _marker_score_sql(code: str) -> str:
    """Non-overlapping marker-occurrence count over ' '||lower(text)||' ' —
    same left-to-right semantics as python str.count/replace."""
    terms = []
    for m in textfn._LANG_MARKERS[code]:
        esc = m.replace("'", "''")
        terms.append(f"(length(p) - length(replace(p, '{esc}', '')))"
                     f" // {len(m)}")
    return " + ".join(terms)


def lang_quality_sql() -> str:
    codes = sorted(textfn._LANG_MARKERS)
    scores = ",\n         ".join(
        f"CAST({_marker_score_sql(c)} AS BIGINT) AS s_{c}" for c in codes)
    glist = ", ".join(f"s_{c}" for c in codes)
    # lang_id iterates codes alphabetically replacing on STRICTLY greater,
    # so ties go to the alphabetically-first code; all-zero -> 'und'
    pred = " ".join(f"WHEN s_{c} = m THEN '{c}'" for c in codes)
    return f"""
WITH padded AS (
  SELECT doc_id, lang, ' ' || lower(text) || ' ' AS p FROM documents),
scored AS (
  SELECT doc_id, lang,
         {scores}
  FROM padded),
best AS (
  SELECT *, GREATEST({glist}) AS m FROM scored)
SELECT doc_id, lang,
       CASE WHEN m = 0 THEN 'und' {pred} END AS lang_pred,
       s_en AS stop_hits
FROM best
"""


def rolling_fingerprints(sf_dir: str):
    """Karp-Rabin winnowing fingerprint per doc. Oracle-exact: the rolling
    recurrence is position-decomposable (window hash = Σ byte·257^(W-1-j)
    mod 2^61), so the SQL twin computes each window hash directly from a
    16-row power table — see ``rolling_fingerprints_sql`` (byte==ord(char)
    holds because the corpus is ASCII; HUGEINT keeps the products exact)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table({
            "doc_id": batch["doc_id"],
            "fingerprint": pa.array(
                [textfn.rolling_fingerprint(t) for t in texts], pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def rolling_fingerprints_sql(window: int = 16, mod: int = 1 << 61) -> str:
    """DuckDB twin of ``functions.text.rolling_fingerprint``: min over all
    ``window``-byte Karp-Rabin hashes, short docs hashed whole. Exact
    integer arithmetic via HUGEINT with the same mod-2^61 reduction; the
    rolling form and the direct power-sum form are algebraically equal."""
    w = window
    pows = [pow(257, w - 1 - j, mod) for j in range(w)]
    ptable = ", ".join(f"({j}, {pows[j]}::HUGEINT)" for j in range(w))
    return f"""
WITH p AS (SELECT * FROM (VALUES {ptable}) AS t(j, pw)),
d AS (SELECT doc_id, text, length(text) AS n FROM documents),
long AS (
  SELECT d.doc_id, s.i,
         (SUM((ord(substr(d.text, s.i + p.j, 1))::HUGEINT * p.pw) % {mod}))
           % {mod} AS h
  FROM d, unnest(generate_series(1, d.n - {w} + 1)) AS s(i), p
  WHERE d.n >= {w}
  GROUP BY d.doc_id, s.i),
long_min AS (SELECT doc_id, MIN(h) AS fingerprint FROM long GROUP BY doc_id),
short AS (
  SELECT d.doc_id,
         COALESCE((SUM((ord(substr(d.text, p.j - ({w} - d.n) + 1, 1))::HUGEINT
                        * p.pw) % {mod})) % {mod}, 0) AS fingerprint
  FROM d LEFT JOIN p ON p.j >= {w} - d.n
  WHERE d.n < {w}
  GROUP BY d.doc_id)
SELECT doc_id, CAST(fingerprint AS BIGINT) AS fingerprint FROM long_min
UNION ALL
SELECT doc_id, CAST(fingerprint AS BIGINT) AS fingerprint FROM short
"""


def minhash_verified_pairs(sf_dir: str, *, threshold: float = 0.35):  # = MINHASH_VERIFY_THRESHOLD
    """MinHash-LSH candidates -> DISTRIBUTED exact-Jaccard verify
    (dedup.verify_jaccard_pairs_distributed — co-partitioned pairs+texts,
    no driver materialization). Returns the verified-pairs Dataset."""
    docs = noisy_documents(sf_dir)
    pairs = dedup_stage.minhash_candidate_pairs(docs)
    return dedup_stage.verify_jaccard_pairs_distributed(
        pairs, noisy_documents(sf_dir), threshold=threshold)


def minhash_near_dups(sf_dir: str):
    """MinHash-LSH near-dup pairs over the noisy corpus, Jaccard-verified.
    The pipeline is fully distributed; only the (small) verified-pair
    RESULT is collected for the deterministic sorted return.  Hash-exact
    vs minhash_near_dups_sql(): the md5/splitmix64 family is replicated
    bit-for-bit in the oracle, and jaccard = |A∩B|/|A∪B| is the same
    int/int float64 division on both sides."""
    out = minhash_verified_pairs(sf_dir).to_pandas()[["a", "b", "jaccard"]]
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def simhash_near_dups(sf_dir: str):
    """SimHash hamming<=6 pairs over the noisy corpus.  Hash-exact vs
    simhash_near_dups_sql(): fingerprints, prefix buckets and the hamming
    verify are replicated bit-for-bit in DuckDB."""
    docs = noisy_documents(sf_dir)
    return dedup_stage.simhash_pairs(docs, max_hamming=SIMHASH_MAX_HAMMING,
                                     prefix_bits=SIMHASH_PREFIX_BITS)


NGRAM_SUBSET_MAX = 120       # base doc_id cap for the all-pairs subset
NGRAM_JACCARD_THRESHOLD = 0.3


def ngram_jaccard(sf_dir: str):
    """Exact char-5-gram Jaccard over ALL pairs of a deterministic subset of
    the noisy corpus (base doc_id <= NGRAM_SUBSET_MAX plus its injected
    duplicates). This is the verify kernel of the minhash pipeline run
    without the LSH candidate filter, so it IS SQL-expressible and
    oracle-checked: jaccard = |A∩B| / |A∪B| over distinct 5-gram sets, an
    exact integer division in float64 on both sides.

    Scale shape: pair generation is the broadcast-small-side pattern —
    gram sets for the subset are ray.put once; the pair list streams
    through map_batches."""
    import ray
    import ray.data as rd

    from ..functions import hashing

    def subset(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.select(["doc_id", "text"]).filter(
            pa.array(did % 1_000_000 <= NGRAM_SUBSET_MAX))

    texts: dict[int, str] = {}
    for b in noisy_documents(sf_dir).map_batches(
            subset, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        for i, t in zip(b.column("doc_id").to_pylist(),
                        b.column("text").to_pylist()):
            texts[int(i)] = t

    ids = np.asarray(sorted(texts), dtype=np.int64)
    ai, bi = np.triu_indices(len(ids), k=1)
    pairs = rd.from_arrow(pa.table({"a": ids[ai], "b": ids[bi]}))
    grams_ref = ray.put({i: hashing.char_ngrams(t, 5) for i, t in texts.items()})

    def verify(batch: pa.Table) -> pa.Table:
        g = ray.get(grams_ref) if not isinstance(grams_ref, dict) else grams_ref
        a = batch.column("a").to_pylist()
        b = batch.column("b").to_pylist()
        j = [hashing.jaccard(g[x], g[y]) for x, y in zip(a, b)]
        out = batch.append_column("jaccard", pa.array(j, pa.float64()))
        return out.filter(pc.greater_equal(out["jaccard"],
                                           NGRAM_JACCARD_THRESHOLD))

    return pairs.map_batches(verify, batch_format="pyarrow", batch_size=4096)


_NGRAM_SET_SQL = """CASE WHEN len(text) < 5 THEN [text]
    ELSE list_distinct(list_transform(range(1, len(text) - 3),
                                      i -> substr(text, i, 5))) END"""

NGRAM_JACCARD_SQL = f"""
WITH noisy AS ({NOISY_DOCUMENTS_SQL}),
sub AS (
  SELECT doc_id, {_NGRAM_SET_SQL} AS g
  FROM noisy WHERE doc_id % 1000000 <= {NGRAM_SUBSET_MAX}
)
SELECT x.doc_id AS a, y.doc_id AS b,
       len(list_intersect(x.g, y.g)) / len(list_distinct(x.g || y.g)) AS jaccard
FROM sub x JOIN sub y ON x.doc_id < y.doc_id
WHERE len(list_intersect(x.g, y.g)) / len(list_distinct(x.g || y.g))
      >= {NGRAM_JACCARD_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# Exact DuckDB twin of the full MinHash-LSH near-dup pipeline.
#
# The whole chain is SQL-expressible because the hash family is chosen for
# it (functions/hashing.py): gram hash = first 8 bytes of md5 masked to 63
# bits; per-permutation hash = splitmix64(gram ^ seed_p) with the wrapping
# 64-bit multiplies emulated via 32-bit splits over HUGEINT; LSH band key =
# md5 of the band's signature values comma-joined.  Seeds/constants are
# inlined at SQL-build time from the same tables numpy uses.
# ---------------------------------------------------------------------------

MINHASH_NUM_PERM = 64
MINHASH_BANDS = 16
MINHASH_SHINGLE_W = 5
MINHASH_VERIFY_THRESHOLD = 0.35


def _mulw_sql(x: str, c: int) -> str:
    """SQL expression for the 64-bit WRAPPING multiply ``(x * c) mod 2^64``
    of UBIGINT column ``x`` by constant ``c``.  DuckDB's UBIGINT multiply
    errors on overflow, so split into 32-bit halves over HUGEINT:
    lo*cl + ((lo*ch + hi*cl) mod 2^32) << 32, all mod 2^64."""
    cl, ch = c & 0xFFFFFFFF, c >> 32
    return (
        f"CAST((CAST(({x}) % 4294967296 AS HUGEINT) * {cl} + "
        f"((CAST(({x}) % 4294967296 AS HUGEINT) * {ch} + "
        f"CAST(({x}) // 4294967296 AS HUGEINT) * {cl}) % 4294967296) "
        f"* 4294967296) % 18446744073709551616 AS UBIGINT)"
    )


def _minhash_verified_sql(order_by: str = "") -> str:
    """Shared CTE chain: noisy corpus -> word shingles -> md5 gram hashes
    -> splitmix64 permutation mins -> LSH bands -> candidate pairs ->
    exact char-5-gram Jaccard verify.  Mirrors _MinHashBands +
    verify_jaccard_pairs_distributed value-for-value."""
    from ..functions import hashing

    from ..stages.dedup import MINHASH_BUCKET_CAP as cap  # noqa: N813

    seeds = hashing.mix_seeds(MINHASH_NUM_PERM)
    seed_rows = ", ".join(
        f"({p}, {int(s)}::UBIGINT)" for p, s in enumerate(seeds))
    w = MINHASH_SHINGLE_W
    rows = MINHASH_NUM_PERM // MINHASH_BANDS
    return f"""
WITH noisy AS ({NOISY_DOCUMENTS_SQL}),
wd AS (SELECT doc_id,
              list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
       FROM noisy),
gr AS (SELECT doc_id,
              CASE WHEN len(ws) < {w} THEN [coalesce(array_to_string(ws, ' '), '')]
                   ELSE list_transform(range(1, len(ws) - {w - 2}),
                                       i -> array_to_string(ws[i : i + {w - 1}], ' '))
              END AS gs
       FROM wd),
gh AS (SELECT doc_id,
              ('0x' || substr(md5(g), 1, 16))::UBIGINT % 9223372036854775808 AS h
       FROM (SELECT doc_id, unnest(gs) AS g FROM gr)),
seeds(p, s) AS (SELECT * FROM (VALUES {seed_rows})),
m0 AS (SELECT doc_id, p, xor(h, s) AS v FROM gh CROSS JOIN seeds),
m1 AS (SELECT doc_id, p, xor(v, v >> 30) AS v FROM m0),
m2 AS (SELECT doc_id, p, {_mulw_sql('v', hashing.MIX_C1)} AS v FROM m1),
m3 AS (SELECT doc_id, p, xor(v, v >> 27) AS v FROM m2),
m4 AS (SELECT doc_id, p, {_mulw_sql('v', hashing.MIX_C2)} AS v FROM m3),
m5 AS (SELECT doc_id, p, xor(v, v >> 31) AS v FROM m4),
sig AS (SELECT doc_id, p, CAST(min(v) >> 1 AS BIGINT) AS sv
        FROM m5 GROUP BY doc_id, p),
band AS (SELECT doc_id, p // {rows} AS band_id,
                md5(string_agg(sv::VARCHAR, ',' ORDER BY p)) AS bkey
         FROM sig GROUP BY doc_id, p // {rows}),
br AS (SELECT doc_id, band_id, bkey,
              ROW_NUMBER() OVER (PARTITION BY band_id, bkey
                                 ORDER BY doc_id) AS rn
       FROM band),
-- bucket-size cap mirrored from dedup.minhash_candidate_pairs: full
-- pairs among the first {cap} members of a bucket, the overflow tail
-- star-paired to the bucket's min id (rn = 1)
cand AS (SELECT DISTINCT a, b FROM (
         SELECT x.doc_id AS a, y.doc_id AS b
         FROM br x JOIN br y
           ON x.band_id = y.band_id AND x.bkey = y.bkey
          AND x.doc_id < y.doc_id
          AND x.rn <= {cap} AND y.rn <= {cap}
         UNION ALL
         SELECT h.doc_id AS a, y.doc_id AS b
         FROM br h JOIN br y
           ON h.band_id = y.band_id AND h.bkey = y.bkey
          AND h.rn = 1 AND y.rn > {cap})),
gsets AS (SELECT doc_id, {_NGRAM_SET_SQL} AS g FROM noisy)
SELECT c.a, c.b,
       len(list_intersect(x.g, y.g)) / len(list_distinct(x.g || y.g)) AS jaccard
FROM cand c
JOIN gsets x ON x.doc_id = c.a
JOIN gsets y ON y.doc_id = c.b
WHERE len(list_intersect(x.g, y.g)) / len(list_distinct(x.g || y.g))
      >= {MINHASH_VERIFY_THRESHOLD}
{order_by}
"""


def minhash_near_dups_sql() -> str:
    return _minhash_verified_sql(order_by="ORDER BY a, b")


SIMHASH_MAX_HAMMING = 6
SIMHASH_PREFIX_BITS = 16


def simhash_near_dups_sql() -> str:
    """Exact DuckDB twin of dedup.simhash_pairs(max_hamming=6) at
    ntables=1: word-2-shingle md5 hashes (multiset — duplicates vote),
    per-bit majority vote fingerprint, bucket by the top 16 bits, and the
    in-bucket hamming verify via bit_count(xor).  Replicates the BUCKETED
    algorithm (pairs in different prefix buckets are not emitted), so the
    oracle checks the algorithm's real output, not an all-pairs ideal.
    The per-bucket pair-output cap (dedup.SIMHASH_BUCKET_CAP) is mirrored
    exactly like the minhash twin's: full pairs where both members rank
    <= cap within their bucket (by doc_id), the overflow tail paired only
    against the bucket hub (rn = 1)."""
    from ..stages.dedup import SIMHASH_BUCKET_CAP as cap  # noqa: N813

    return f"""
WITH noisy AS ({NOISY_DOCUMENTS_SQL}),
wd AS (SELECT doc_id,
              list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
       FROM noisy),
gr AS (SELECT doc_id,
              CASE WHEN len(ws) < 2 THEN [coalesce(array_to_string(ws, ' '), '')]
                   ELSE list_transform(range(1, len(ws)),
                                       i -> array_to_string(ws[i : i + 1], ' '))
              END AS gs
       FROM wd),
gh AS (SELECT doc_id,
              ('0x' || substr(md5(g), 1, 16))::UBIGINT % 9223372036854775808 AS h
       FROM (SELECT doc_id, unnest(gs) AS g FROM gr)),
cnt AS (SELECT doc_id, count(*) AS n FROM gh GROUP BY doc_id),
bits AS (SELECT doc_id, b, sum(((h >> b) & 1)::BIGINT) AS ones
         FROM gh CROSS JOIN (SELECT unnest(range(0, 64)) AS b)
         GROUP BY doc_id, b),
fp AS (SELECT bits.doc_id,
              bit_or(CASE WHEN 2 * ones > n THEN (1::UBIGINT << b)
                          ELSE 0::UBIGINT END) AS f
       FROM bits JOIN cnt ON cnt.doc_id = bits.doc_id
       GROUP BY bits.doc_id),
bk AS (SELECT doc_id, f, f >> {64 - SIMHASH_PREFIX_BITS} AS bucket,
              ROW_NUMBER() OVER (PARTITION BY f >> {64 - SIMHASH_PREFIX_BITS}
                                 ORDER BY doc_id) AS rn
       FROM fp)
SELECT a, b, hamming FROM (
  SELECT x.doc_id AS a, y.doc_id AS b,
         bit_count(xor(x.f, y.f))::BIGINT AS hamming
  FROM bk x JOIN bk y ON x.bucket = y.bucket AND x.doc_id < y.doc_id
   AND x.rn <= {cap} AND y.rn <= {cap}
  UNION ALL
  SELECT h.doc_id AS a, y.doc_id AS b,
         bit_count(xor(h.f, y.f))::BIGINT AS hamming
  FROM bk h JOIN bk y ON h.bucket = y.bucket
   AND h.rn = 1 AND y.rn > {cap})
WHERE hamming <= {SIMHASH_MAX_HAMMING}
ORDER BY a, b
"""


def minhash_clusters_sql() -> str:
    """Connected components over the verified pairs: recursive min-label
    reachability (labels = min doc_id reachable), members only — the exact
    output of dedup.near_dup_clusters_distributed."""
    return f"""
WITH RECURSIVE ver AS ({_minhash_verified_sql()}),
edges AS (SELECT a AS x, b AS y FROM ver UNION ALL SELECT b, a FROM ver),
nodes AS (SELECT DISTINCT x FROM edges),
reach(x, lab) AS (
    SELECT x, x FROM nodes
    UNION
    SELECT e.y, r.lab FROM reach r JOIN edges e ON e.x = r.x
)
SELECT x AS doc_id, min(lab) AS cluster_rep
FROM reach GROUP BY x HAVING min(lab) < x
ORDER BY doc_id
"""


# C4-style quality gate thresholds (published-heuristic shapes: length
# bounds, punctuation/digit density caps, minimum word count)
QF_MIN_CHARS = 80
QF_MAX_CHARS = 20000
QF_MIN_TOKENS = 10
QF_MAX_PUNCT_PER_CHAR_PCT = 20   # n_punct * 100 < n_chars * 20
QF_MAX_DIGIT_PER_CHAR_PCT = 30


def quality_filter(sf_dir: str):
    """Training-data quality GATE (the filter stage a C4-style pipeline
    runs before dedup): keep documents passing integer-exact length /
    token / punctuation-density / digit-density rules; rejected rows keep
    an audit ``reject_reason`` (first failing rule, fixed order — the
    DiscardFeatureWriter pattern applied to webtext). Output
    (doc_id, kept, reject_reason) for every document — exact SQL twin
    (all-integer arithmetic; density caps compare n*100 < limit*chars, no
    float division)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        kept, reason = [], []
        for t in texts:
            m = textfn.quality_metrics(t)
            toks = textfn.token_count(t)
            if m["n_chars"] < QF_MIN_CHARS:
                r = "too_short"
            elif m["n_chars"] > QF_MAX_CHARS:
                r = "too_long"
            elif toks < QF_MIN_TOKENS:
                r = "too_few_tokens"
            elif m["n_punct"] * 100 >= m["n_chars"] * QF_MAX_PUNCT_PER_CHAR_PCT:
                r = "punct_dense"
            elif m["n_digit"] * 100 >= m["n_chars"] * QF_MAX_DIGIT_PER_CHAR_PCT:
                r = "digit_dense"
            else:
                r = None
            kept.append(r is None)
            reason.append(r)
        return pa.table({
            "doc_id": batch["doc_id"],
            "kept": pa.array(kept, pa.bool_()),
            "reject_reason": pa.array(reason, pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


QUALITY_FILTER_SQL = rf"""
WITH m AS (
  SELECT doc_id,
         length(text) AS n_chars,
         (length(text) - length(regexp_replace(text, '[.,;:!?''"()\[\]{{}}-]', '', 'g'))) AS n_punct,
         (length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) AS n_digit,
         len(list_filter(str_split(text, ' '), x -> x <> '')) AS n_tokens
  FROM documents)
SELECT doc_id,
  CASE
    WHEN n_chars < {QF_MIN_CHARS} THEN 'too_short'
    WHEN n_chars > {QF_MAX_CHARS} THEN 'too_long'
    WHEN n_tokens < {QF_MIN_TOKENS} THEN 'too_few_tokens'
    WHEN n_punct * 100 >= n_chars * {QF_MAX_PUNCT_PER_CHAR_PCT} THEN 'punct_dense'
    WHEN n_digit * 100 >= n_chars * {QF_MAX_DIGIT_PER_CHAR_PCT} THEN 'digit_dense'
  END AS reject_reason,
  CASE
    WHEN n_chars < {QF_MIN_CHARS} OR n_chars > {QF_MAX_CHARS}
      OR n_tokens < {QF_MIN_TOKENS}
      OR n_punct * 100 >= n_chars * {QF_MAX_PUNCT_PER_CHAR_PCT}
      OR n_digit * 100 >= n_chars * {QF_MAX_DIGIT_PER_CHAR_PCT}
    THEN FALSE ELSE TRUE END AS kept
FROM m
"""


def quality_quartiles(sf_dir: str):
    """Per-lang exact order statistics of doc length (q25/median/q75).
    Order stats have no combiner, so the raw (lang, n_chars) pairs — 10
    bytes/row — hash-exchange on lang and each partition computes its
    groups' quantiles in one numpy pass. Linear-interpolation quantiles
    over ints are deterministic doubles, so this IS oracle-checked
    (DuckDB quantile_cont twin)."""
    import ray.data as rd

    from ..util import hash_rollup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "text"])

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "lang": batch["lang"],
            "n_chars": pc.utf8_length(batch["text"]),
        })

    pairs = ds.map_batches(project, batch_format="pyarrow")

    def quartiles(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lang, sub in g.groupby("lang", sort=False):
            a = sub["n_chars"].to_numpy(dtype=np.float64)
            rows.append((lang, np.percentile(a, 25), np.percentile(a, 50),
                         np.percentile(a, 75)))
        return pd.DataFrame(rows, columns=["lang", "q25_chars",
                                           "med_chars", "q75_chars"])

    return hash_rollup(pairs, ["lang"], quartiles, npartitions=4)


QUALITY_QUARTILES_SQL = """
SELECT lang,
       quantile_cont(length(text), 0.25) AS q25_chars,
       quantile_cont(length(text), 0.50) AS med_chars,
       quantile_cont(length(text), 0.75) AS q75_chars
FROM documents GROUP BY lang
"""


TOP_TOKENS_K = 10


def top_tokens(sf_dir: str, k: int = TOP_TOKENS_K):
    """Per-lang top-k frequent tokens (corpus vocabulary heavy-hitters):
    whitespace tokens exploded per batch and pre-reduced to (lang, token,
    cnt) partials, ONE hash exchange on (lang, token)-> per-partition count
    merge, then a second tiny exchange on lang for the vectorized top-k
    (count desc, token asc tiebreak — fully deterministic, exact SQL twin
    with a row_number window)."""
    import ray.data as rd

    from ..util import hash_rollup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "text"])

    def explode_counts(batch: pa.Table) -> pa.Table:
        langs = batch.column("lang").to_pylist()
        texts = batch.column("text").to_pylist()
        out_lang, out_tok = [], []
        for lg, t in zip(langs, texts):
            toks = [w for w in t.split(" ") if w]
            out_lang.extend([lg] * len(toks))
            out_tok.extend(toks)
        t = pa.table({"lang": pa.array(out_lang, pa.string()),
                      "token": pa.array(out_tok, pa.string())})
        g = pa.TableGroupBy(t, ["lang", "token"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["lang", "token", "cnt"])

    partials = ds.map_batches(explode_counts, batch_format="pyarrow")

    counts = hash_rollup(
        partials, ["lang", "token"],
        lambda t: pa.TableGroupBy(t, ["lang", "token"])
        .aggregate([("cnt", "sum")])
        .rename_columns(["lang", "token", "n"]),
        batch_format="pyarrow")

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["lang", "n", "token"],
                          ascending=[True, False, True], kind="mergesort")
        g = g.groupby("lang", sort=False).head(k).reset_index(drop=True)
        g["rank"] = (g.groupby("lang", sort=False).cumcount() + 1).astype("int64")
        g["n"] = g["n"].astype("int64")
        return g

    return hash_rollup(counts, ["lang"], topk, npartitions=4)


def top_tokens_sql(k: int = TOP_TOKENS_K) -> str:
    return f"""
WITH toks AS (
  SELECT lang, tok AS token
  FROM documents, UNNEST(list_filter(str_split(text, ' '), x -> x <> ''))
       AS t(tok)),
counts AS (
  SELECT lang, token, COUNT(*) AS n FROM toks GROUP BY lang, token),
ranked AS (
  SELECT lang, token, n,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY n DESC, token ASC) AS rank
  FROM counts)
SELECT lang, token, n, rank FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# chunk-level dedup (C4-style line dedup; deterministic 8-word segmentation)
# ---------------------------------------------------------------------------

CHUNK_WORDS = 8
DUP_SPAN_L = 24  # minimum duplicated-substring length (chars)


def dup_spans(sf_dir: str, *, L: int = DUP_SPAN_L,
              npartitions: int | None = None):
    """Exact substring-span dedup (round 5): every MAXIMAL character span
    covered by length-``L`` substrings that occur in >= 2 DISTINCT docs of
    the noisy corpus — the cross-document duplicated-span finder of
    suffix-array training-data dedup (Lee et al., "Deduplicating Training
    Data Makes Language Models Better"), re-shaped for Ray Data as two
    streaming exchanges instead of a global suffix array:

      1. explode each doc into its (gram, doc_id, pos) L-gram rows →
         hash exchange on GRAM → per-partition vectorized filter to
         grams seen in >= 2 distinct docs (emit their positions);
      2. exchange the surviving (doc_id, pos) rows on DOC → one
         vectorized gaps-and-islands merge per partition (spans break
         where pos > prev_pos + L) → (doc_id, span_start, span_len).

    Everything is integer/string-exact (no floats anywhere), so the SQL
    twin (:func:`dup_spans_sql`) hash-matches bit-for-bit. Scale shape:
    both exchanges are linear in total grams with no pair blow-up (a
    gram duplicated across D docs ships D position rows, never D^2
    pairs); at corpus scale the gram key would ship as the 8-byte
    Karp-Rabin hash with a residual-collision confirm pass — here the
    string key keeps the oracle exact. Positions are 1-based to match
    SQL ``substr``. Output: one row per maximal duplicated span."""
    from ..util import hash_rollup

    ds = noisy_documents(sf_dir)

    def grams(batch: pa.Table) -> pa.Table:
        ids_ = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_d, out_p, out_g = [], [], []
        for did, t in zip(ids_, texts):
            n = len(t)
            if n < L:
                continue
            k = n - L + 1
            out_d.append(np.full(k, did, dtype=np.int64))
            out_p.append(np.arange(1, k + 1, dtype=np.int64))
            out_g.extend(t[i:i + L] for i in range(k))
        if not out_d:
            return pa.table({"gram": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        return pa.table({"gram": pa.array(out_g, pa.string()),
                         "doc_id": pa.array(np.concatenate(out_d)),
                         "pos": pa.array(np.concatenate(out_p))})

    def crossdoc(g: pd.DataFrame) -> pd.DataFrame:
        # grams present in >= 2 distinct docs; one transform, no loop
        nuniq = g.groupby("gram", sort=False)["doc_id"].transform("nunique")
        return g.loc[nuniq >= 2, ["doc_id", "pos"]]

    hits = hash_rollup(ds.map_batches(grams, batch_format="pyarrow"),
                       ["gram"], crossdoc, npartitions=npartitions)

    def spans(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "span_start": pd.Series([], dtype="int64"),
                                 "span_len": pd.Series([], dtype="int64")})
        g = g.sort_values(["doc_id", "pos"], kind="mergesort")
        did = g["doc_id"].to_numpy()
        pos = g["pos"].to_numpy()
        brk = np.empty(len(g), dtype=bool)
        brk[0] = True
        brk[1:] = (did[1:] != did[:-1]) | (pos[1:] > pos[:-1] + L)
        grp = np.cumsum(brk) - 1
        starts = np.zeros(grp[-1] + 1, dtype=np.int64)
        ends = np.zeros(grp[-1] + 1, dtype=np.int64)
        docs = np.zeros(grp[-1] + 1, dtype=np.int64)
        starts[grp[brk]] = pos[brk]
        np.maximum.at(ends, grp, pos + L - 1)
        docs[grp[brk]] = did[brk]
        return pd.DataFrame({"doc_id": docs, "span_start": starts,
                             "span_len": ends - starts + 1})

    return hash_rollup(hits, ["doc_id"], spans, npartitions=npartitions)


def dup_spans_sql(L: int = DUP_SPAN_L) -> str:
    """DuckDB twin of :func:`dup_spans`: same L-gram explode (1-based
    substr), same >=2-distinct-docs filter, same gaps-and-islands merge
    (break when pos > prev_pos + L); pure integer/string ops."""
    return f"""
WITH noisy AS ({NOISY_DOCUMENTS_SQL}),
d AS (SELECT doc_id, text, length(text) AS n FROM noisy),
g AS (
  SELECT d.doc_id, s.i AS pos, substr(d.text, s.i, {L}) AS gram
  FROM d, unnest(generate_series(1, d.n - {L} + 1)) AS s(i)
  WHERE d.n >= {L}),
dup AS (SELECT gram FROM g GROUP BY gram
        HAVING COUNT(DISTINCT doc_id) >= 2),
hits AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
marked AS (
  SELECT doc_id, pos,
         CASE WHEN pos > COALESCE(MAX(pos) OVER (
                  PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  -{2 * L}) + {L} THEN 1 ELSE 0 END AS brk
  FROM hits),
grps AS (
  SELECT doc_id, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS grp
  FROM marked)
SELECT doc_id, MIN(pos) AS span_start,
       MAX(pos) + {L} - 1 - MIN(pos) + 1 AS span_len
FROM grps GROUP BY doc_id, grp
"""


# winner order packs (doc_id, chunk_no) into one int64 so the min-winner
# reduction is a single Arrow group-min: assumes chunk_no < 2^20 (docs
# shorter than ~8M words) and doc_id < 2^43 — both document-corpus-safe.
_CHUNK_NO_BITS = 20


def chunk_dedup(sf_dir: str, *, chunk_words: int = CHUNK_WORDS,
                npartitions: int | None = None):
    """C4-style duplicate-chunk removal over the noisy corpus: segment each
    document into consecutive ``chunk_words``-word chunks, keep only the
    GLOBAL first occurrence of each distinct chunk (ordered by (doc_id,
    chunk_no)), reassemble surviving chunks in original order. Documents
    whose every chunk is a duplicate disappear (the injected exact-dup docs
    collapse entirely; near-dups keep only their divergent tail chunk).

    Scale shape — TWO streaming hash exchanges, nothing on the driver:
      1. `hash_rollup` on chunk_hash: every occurrence of a chunk lands in
         the same partition, so the global winner (min packed (doc_id,
         chunk_no)) is a LOCAL groupby-min and the keep filter happens in
         the same merge — no separate winner table, no second pass over
         the corpus (same single-exchange shape as `dedup_exact_rows`);
      2. `hash_rollup` on doc_id reassembles kept chunks (sort by
         chunk_no, single join) and counts kept/dropped.
    Chunk text crosses the wire once per exchange; no mid-pipeline
    materialization.
    """
    from ..functions import hashing
    from ..util import hash_rollup

    docs = noisy_documents(sf_dir)

    def explode(batch: pa.Table) -> pa.Table:
        out_id, out_no, out_chunk, out_hash, out_tot = [], [], [], [], []
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        for did, txt in zip(ids, texts):
            # split(' ') (not split()) mirrors DuckDB string_split semantics
            words = (txt or "").split(" ")
            n_chunks = (len(words) + chunk_words - 1) // chunk_words
            for i in range(n_chunks):
                chunk = " ".join(words[i * chunk_words:(i + 1) * chunk_words])
                out_id.append(did)
                out_no.append(i + 1)
                out_chunk.append(chunk)
                out_hash.append(hashing.hash_bytes(chunk.encode("utf-8")))
                out_tot.append(n_chunks)
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "chunk_no": pa.array(out_no, pa.int64()),
            "chunk": pa.array(out_chunk, pa.string()),
            "chunk_hash": pa.array(out_hash, pa.int64()),
            "n_chunks": pa.array(out_tot, pa.int64()),
        })

    chunks = docs.map_batches(explode, batch_format="pyarrow")

    def keep_winning(g: pd.DataFrame) -> pd.DataFrame:
        ordv = (g["doc_id"].to_numpy(dtype=np.int64) << _CHUNK_NO_BITS) \
            + g["chunk_no"].to_numpy(dtype=np.int64)
        g = g.assign(ord=ordv)
        # Partition on chunk_hash (cheap 8-byte exchange key), but elect
        # the winner per chunk TEXT — equal texts always share the hash so
        # they are co-located, while two distinct chunks colliding on the
        # 63-bit hash form separate groups instead of one silently
        # deleting the other corpus-wide ('exact' oracle contract).
        win = g.groupby("chunk", sort=False)["ord"].transform("min")
        kept = g[g["ord"] == win]
        return kept[["doc_id", "chunk_no", "chunk", "n_chunks"]]

    kept = hash_rollup(chunks, ["chunk_hash"], keep_winning,
                       npartitions=npartitions)

    # exchange 3: reassemble per doc
    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "chunk_no"], kind="mergesort")
        out = g.groupby("doc_id", sort=True).agg(
            text_clean=("chunk", " ".join),
            n_kept=("chunk", "size"),
            n_chunks=("n_chunks", "first"),
        ).reset_index()
        out["n_dropped"] = (out["n_chunks"] - out["n_kept"]).astype(np.int64)
        out["n_kept"] = out["n_kept"].astype(np.int64)
        return out[["doc_id", "text_clean", "n_kept", "n_dropped"]]

    return hash_rollup(kept, ["doc_id"], reassemble, npartitions=npartitions)


# ---------------------------------------------------------------------------
# TF-IDF-style distinctive terms per document
# ---------------------------------------------------------------------------

TFIDF_K = 3


def tfidf_terms(sf_dir: str, k: int = TFIDF_K):
    """Top-``k`` characteristic terms per document, ranked by (tf DESC,
    df ASC, token ASC) — the TF-IDF ordering with exact integer keys
    (ranking by tf*ln(N/df) floats would make the oracle libm-dependent;
    the lexicographic (tf, -df) order ranks identically for fixed N).

    Scale shape — TWO hash exchanges over an unbounded token key space:
      1. per-doc tf rows (computed exactly in-block — a document is one
         row) repartition by token; each partition holds ALL rows of its
         tokens, so document frequency is a vectorized groupby-size
         attach, no separate df table or join;
      2. repartition by doc_id; vectorized sort + head(k) per doc.
    """
    import ray.data as rd

    from ..util import hash_rollup

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def tf_rows(b: pa.Table) -> pa.Table:
        out_id, out_tok, out_tf = [], [], []
        for did, txt in zip(b.column("doc_id").to_pylist(),
                            b.column("text").to_pylist()):
            toks = [w for w in (txt or "").split(" ") if w]
            if not toks:
                continue
            uniq, cnt = np.unique(np.array(toks, dtype=object),
                                  return_counts=True)
            out_id.extend([did] * len(uniq))
            out_tok.extend(uniq.tolist())
            out_tf.extend(cnt.tolist())
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "token": pa.array(out_tok, pa.string()),
                         "tf": pa.array(out_tf, pa.int64())})

    rows = docs.map_batches(tf_rows, batch_format="pyarrow")

    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["df"] = g.groupby("token", sort=False)["doc_id"] \
            .transform("size").astype(np.int64)
        return g

    with_df = hash_rollup(rows, ["token"], attach_df)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "token"], kind="mergesort")
        g = g.sort_values(["doc_id", "tf", "df"], kind="mergesort",
                          ascending=[True, False, True])
        g = g.groupby("doc_id", sort=False).head(k).copy()
        g["rank"] = g.groupby("doc_id", sort=False).cumcount() + 1
        g["rank"] = g["rank"].astype(np.int64)
        return g[["doc_id", "token", "tf", "df", "rank"]]

    return hash_rollup(with_df, ["doc_id"], topk)


def tfidf_terms_sql(k: int = TFIDF_K) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, tok
  FROM documents, UNNEST(list_filter(str_split(text, ' '), x -> x <> ''))
       AS t(tok)),
tf AS (
  SELECT doc_id, tok AS token, COUNT(*) AS tf
  FROM toks GROUP BY doc_id, tok),
df AS (
  SELECT token, COUNT(*) AS df FROM tf GROUP BY token)
SELECT doc_id, token, tf, df, rank FROM (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf DESC, df.df ASC, tf.token ASC)
           AS rank
  FROM tf JOIN df USING (token))
WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# benchmark decontamination (eval-set n-gram overlap flagging)
# ---------------------------------------------------------------------------

EVAL_MOD = 10       # doc_id % 10 == EVAL_REM -> held-out "benchmark" doc
EVAL_REM = 3
DECON_NGRAM = 5     # word 5-grams


def decontaminate(sf_dir: str, *, width: int = DECON_NGRAM):
    """Training-data decontamination: flag corpus documents sharing any
    word ``width``-gram with a held-out benchmark set (docs with
    ``doc_id % EVAL_MOD == EVAL_REM``). Returns (doc_id, n_hits) for
    contaminated corpus docs — n_hits = count of DISTINCT shared grams.

    Scale shape: the benchmark side is small by nature (eval suites are
    thousands of docs), so its distinct gram-hash set is collected once,
    sorted, and broadcast via ``ray.put``; the corpus streams through one
    ``map_batches`` doing a vectorized ``searchsorted`` membership count
    per doc. No shuffle at all — the big side never moves.
    """
    import ray
    import ray.data as rd

    from ..functions import hashing

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def eval_grams(b: pa.Table) -> pa.Table:
        did = b.column("doc_id").to_numpy(zero_copy_only=False)
        sel = b.filter(pa.array(did % EVAL_MOD == EVAL_REM))
        hs = [hashing.shingles(t, width) for t in sel.column("text").to_pylist()]
        flat = np.unique(np.concatenate(hs)) if hs else np.empty(0, np.int64)
        return pa.table({"gram": pa.array(flat, pa.int64())})

    # small side: distinct gram hashes of the eval set -> driver -> broadcast
    gram_rows = docs.map_batches(eval_grams, batch_format="pyarrow").take_all()
    bench = np.unique(np.array([r["gram"] for r in gram_rows], dtype=np.int64))
    bench_ref = ray.put(bench)

    def flag(b: pa.Table, *, bref=bench_ref) -> pa.Table:
        grams_sorted = bref if isinstance(bref, np.ndarray) else ray.get(bref)
        did = b.column("doc_id").to_numpy(zero_copy_only=False)
        keep = did % EVAL_MOD != EVAL_REM
        sel = b.filter(pa.array(keep))
        out_id, out_n = [], []
        for d, t in zip(sel.column("doc_id").to_pylist(),
                        sel.column("text").to_pylist()):
            g = np.unique(hashing.shingles(t, width))
            idx = np.searchsorted(grams_sorted, g)
            idx[idx >= len(grams_sorted)] = 0
            n = int((grams_sorted[idx] == g).sum()) if len(grams_sorted) else 0
            if n > 0:
                out_id.append(d)
                out_n.append(n)
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "n_hits": pa.array(out_n, pa.int64())})

    return docs.map_batches(flag, batch_format="pyarrow")


def decontaminate_sql(width: int = DECON_NGRAM) -> str:
    """DuckDB twin: same tokenization as ``hashing.shingles`` (whitespace
    split, empty tokens dropped), same short-doc fallback (whole text as
    one gram), DISTINCT-gram hit counts, eval docs excluded from output."""
    return f"""
WITH w AS (
  SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS words
  FROM documents),
g AS (
  SELECT doc_id,
         array_to_string(words[i : least(i+{width - 1}, len(words))], ' ') AS gram
  FROM w, unnest(generate_series(
        1, greatest(len(words) - {width - 1}, 1))) AS s(i)),
bench AS (
  SELECT DISTINCT gram FROM g WHERE doc_id % {EVAL_MOD} = {EVAL_REM}),
corpus AS (
  SELECT DISTINCT doc_id, gram FROM g
  WHERE doc_id % {EVAL_MOD} <> {EVAL_REM})
SELECT c.doc_id, COUNT(*) AS n_hits
FROM corpus c JOIN bench b USING (gram)
GROUP BY c.doc_id
"""


def chunk_dedup_sql(chunk_words: int = CHUNK_WORDS) -> str:
    """DuckDB twin: same segmentation (string_split(' '), 1-based inclusive
    list slices), same global first-occurrence winner order (doc_id,
    chunk_no), same space-joined reassembly; docs with zero surviving
    chunks drop out of the GROUP BY."""
    return f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words
  FROM ({NOISY_DOCUMENTS_SQL})),
c AS (
  SELECT doc_id, i AS chunk_no,
         array_to_string(
           words[(i-1)*{chunk_words}+1 : least(i*{chunk_words}, len(words))],
           ' ') AS chunk
  FROM w, unnest(generate_series(
        1, CAST(ceil(len(words)/{chunk_words}.0) AS BIGINT))) AS s(i)),
win AS (
  SELECT doc_id, chunk_no, chunk,
         ROW_NUMBER() OVER (PARTITION BY chunk
                            ORDER BY doc_id, chunk_no) AS rn,
         COUNT(*) OVER (PARTITION BY doc_id) AS n_chunks
  FROM c)
SELECT doc_id,
       string_agg(chunk, ' ' ORDER BY chunk_no) AS text_clean,
       COUNT(*) AS n_kept,
       ANY_VALUE(n_chunks) - COUNT(*) AS n_dropped
FROM win WHERE rn = 1
GROUP BY doc_id
"""


# --- PII redaction -----------------------------------------------------------
# The driver corpus contains no PII, so the query deterministically augments
# the text IDENTICALLY on both sides (the established noisy_documents /
# media-table pattern) before detecting and redacting. Patterns are chosen to
# mean the same thing under python `re` and DuckDB's RE2.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_EMAIL_MOD = 4   # doc_id % 4 == 0 -> synthetic email appended
PII_PHONE_MOD = 6   # doc_id % 6 == 0 -> synthetic phone appended


def pii_redact(sf_dir: str):
    """Detect + redact PII (emails, phone numbers) per document.

    Returns (doc_id, n_emails, n_phones, text_redacted) with emails replaced
    by ``[EMAIL]`` and phones by ``[PHONE]`` (email pass first, patterns are
    disjoint). Scale shape: a single stateless ``map_batches`` over zero-copy
    Arrow — module-level compiled regexes, pandas vectorized ``str.count`` /
    ``str.replace`` per batch, no shuffle, no driver materialization. At
    10^12 docs this streams block-by-block like ``quality_scores``.

    Reference analogue: the decode/sanitize gate of exposm's text pipeline
    (extractor/exposm/utils.py:38-60 cleans names before persisting); here
    generalized to corpus-scale PII scrubbing for LLM training data.
    """
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id").to_numpy(zero_copy_only=False)
        s = pd.Series(batch.column("text").to_pylist())
        email_aug = pd.Series(
            np.where(did % PII_EMAIL_MOD == 0,
                     [" Contact user%d@example.com today." % d for d in did],
                     ""))
        phone_aug = pd.Series(
            np.where(did % PII_PHONE_MOD == 0,
                     [" Call 555-010-%04d now." % (d % 10000) for d in did],
                     ""))
        s = s + email_aug + phone_aug
        n_emails = s.str.count(PII_EMAIL_RE).astype("int64")
        n_phones = s.str.count(PII_PHONE_RE).astype("int64")
        red = (s.str.replace(PII_EMAIL_RE, "[EMAIL]", regex=True)
                .str.replace(PII_PHONE_RE, "[PHONE]", regex=True))
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_emails": pa.array(n_emails.to_numpy(), pa.int64()),
            "n_phones": pa.array(n_phones.to_numpy(), pa.int64()),
            "text_redacted": pa.array(red.tolist(), pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


PII_REDACT_SQL = f"""
WITH aug AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % {PII_EMAIL_MOD} = 0
            THEN ' Contact user' || doc_id || '@example.com today.' ELSE '' END
    || CASE WHEN doc_id % {PII_PHONE_MOD} = 0
            THEN ' Call 555-010-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') || ' now.'
            ELSE '' END AS text
  FROM documents)
SELECT doc_id,
  len(regexp_extract_all(text, '{PII_EMAIL_RE}'))::BIGINT AS n_emails,
  len(regexp_extract_all(text, '{PII_PHONE_RE}'))::BIGINT AS n_phones,
  regexp_replace(regexp_replace(text, '{PII_EMAIL_RE}', '[EMAIL]', 'g'),
                 '{PII_PHONE_RE}', '[PHONE]', 'g') AS text_redacted
FROM aug
"""


# --- Gopher-style repetition stats ------------------------------------------
def repetition_stats(sf_dir: str):
    """Per-doc repetition signals (Gopher-style quality filters): total and
    distinct word counts plus the count of the most frequent word and the
    most frequent word-bigram. All-integer output -> exact oracle twin.

    Scale shape: repetition is a PER-DOCUMENT property, so everything is
    local to the batch — explode words/bigrams into flat numpy arrays with a
    doc-index vector, count with one pandas groupby (C hash aggregation),
    max-reduce back per doc. No shuffle; the only per-row python is the
    unavoidable ``str.split``.
    """
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        words_per = [[w for w in t.split(" ") if w] for t in texts]
        lens = np.fromiter((len(w) for w in words_per), np.int64,
                           count=len(words_per))
        n = len(texts)
        flat = np.empty(int(lens.sum()), dtype=object)
        pos = 0
        for ws in words_per:
            flat[pos:pos + len(ws)] = ws
            pos += len(ws)
        doc_idx = np.repeat(np.arange(n), lens)

        n_words = lens
        n_distinct = np.zeros(n, np.int64)
        top_word = np.zeros(n, np.int64)
        top_bigram = np.zeros(n, np.int64)
        if len(flat):
            wc = (pd.DataFrame({"i": doc_idx, "w": flat})
                  .groupby(["i", "w"], sort=False).size())
            per_doc = wc.groupby(level=0)
            agg = per_doc.agg(["count", "max"])
            n_distinct[agg.index.to_numpy()] = agg["count"].to_numpy()
            top_word[agg.index.to_numpy()] = agg["max"].to_numpy()
            same = doc_idx[:-1] == doc_idx[1:]
            if same.any():
                big = (pd.Series(flat[:-1][same]) + " "
                       + pd.Series(flat[1:][same]))
                bc = (pd.DataFrame({"i": doc_idx[:-1][same], "b": big.to_numpy()})
                      .groupby(["i", "b"], sort=False).size())
                bmax = bc.groupby(level=0).max()
                top_bigram[bmax.index.to_numpy()] = bmax.to_numpy()
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_words": pa.array(n_words, pa.int64()),
            "n_distinct_words": pa.array(n_distinct, pa.int64()),
            "top_word_n": pa.array(top_word, pa.int64()),
            "top_bigram_n": pa.array(top_bigram, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


REPETITION_STATS_SQL = """
WITH w AS (
  SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS words
  FROM documents),
tok AS (
  SELECT doc_id, words[i] AS w
  FROM w, unnest(generate_series(1, len(words))) AS s(i)),
big AS (
  SELECT doc_id, words[i] || ' ' || words[i+1] AS b
  FROM w, unnest(generate_series(1, len(words) - 1)) AS s(i)),
wc AS (
  SELECT doc_id, SUM(c) AS n_words, COUNT(*) AS n_distinct_words,
         MAX(c) AS top_word_n
  FROM (SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY doc_id, w)
  GROUP BY doc_id),
bc AS (
  SELECT doc_id, MAX(c) AS top_bigram_n
  FROM (SELECT doc_id, b, COUNT(*) AS c FROM big GROUP BY doc_id, b)
  GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(wc.n_words, 0)::BIGINT AS n_words,
       COALESCE(wc.n_distinct_words, 0)::BIGINT AS n_distinct_words,
       COALESCE(wc.top_word_n, 0)::BIGINT AS top_word_n,
       COALESCE(bc.top_bigram_n, 0)::BIGINT AS top_bigram_n
FROM documents d LEFT JOIN wc ON d.doc_id = wc.doc_id
LEFT JOIN bc ON d.doc_id = bc.doc_id
"""


# ---------------------------------------------------------------------------
# inverted index (postings build)
# ---------------------------------------------------------------------------

POSTINGS_SEG = 32


def postings(sf_dir: str, seg_size: int = POSTINGS_SEG):
    """Inverted-index build: token -> SEGMENTED sorted posting list. The
    search-index analogue of the reference's per-key fan-out sinks
    (extract.py writes one table per admin level; here posting rows per
    token).

    Scale shape: tokens explode per block and pre-reduce to DISTINCT
    (token, doc_id) pairs (the combiner — repeated words inside a doc
    never leave the block), ONE hash exchange on token co-locates each
    token's postings, and a vectorized per-partition merge emits the
    ','-joined ascending doc list in ``seg_size``-id SEGMENTS — a
    stopword token yields many bounded rows, never one corpus-length
    string (the unsegmented form is a memory bomb at 10^12 docs: one
    row holding a billion ids). Output (token, seg, df_seg, doc_list);
    per-token df = sum of df_seg over its segments."""
    import ray.data as rd

    from ..util import hash_rollup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def explode_distinct(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        out_tok, out_id = [], []
        for did, t in zip(ids, texts):
            toks = {w for w in t.split(" ") if w}
            out_tok.extend(toks)
            out_id.extend([int(did)] * len(toks))
        t = pa.table({"token": pa.array(out_tok, pa.string()),
                      "doc_id": pa.array(out_id, pa.int64())})
        return t

    pairs = ds.map_batches(explode_distinct, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["token", "doc_id"], kind="mergesort")
        g = g.assign(seg=(g.groupby("token", sort=False).cumcount()
                          // seg_size).astype("int64"))
        agg = g.groupby(["token", "seg"], sort=False)["doc_id"].agg(
            df_seg="size", doc_list=lambda s: ",".join(map(str, s)))
        out = agg.reset_index()
        out["df_seg"] = out["df_seg"].astype("int64")
        return out

    return hash_rollup(pairs, ["token"], merge)


def postings_sql(seg_size: int = POSTINGS_SEG) -> str:
    return f"""
WITH tok0 AS (
  SELECT doc_id, tok AS token
  FROM documents, UNNEST(list_filter(str_split(text, ' '), x -> x <> ''))
       AS t(tok)),
tok AS (SELECT DISTINCT token, doc_id FROM tok0),
numbered AS (
  SELECT token, doc_id,
         CAST((ROW_NUMBER() OVER (PARTITION BY token ORDER BY doc_id) - 1)
              // {seg_size} AS BIGINT) AS seg
  FROM tok)
SELECT token, seg, COUNT(*)::BIGINT AS df_seg,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_list
FROM numbered GROUP BY token, seg
"""


# ---------------------------------------------------------------------------
# per-lang adaptive percentile gate (two-phase broadcast threshold)
# ---------------------------------------------------------------------------

def percentile_gate(sf_dir: str):
    """Keep documents at or above their language's 25th-percentile length
    — the adaptive-threshold filter a mixing pipeline runs when a fixed
    cutoff would over-prune low-resource languages.

    Two-phase distributed plan: phase 1 hash-exchanges tiny (lang,
    n_chars) pairs and computes the exact per-lang order statistic
    (element at rank ceil(n/4), integer — no interpolation, so the SQL
    twin matches bit-for-bit); the per-lang thresholds are a
    bounded-cardinality table, broadcast once via ray.put; phase 2
    streams the corpus through a vectorized filter against the broadcast
    dict. Nothing big touches the driver and the corpus is read
    column-pruned twice (once per phase) rather than materialized."""
    import ray

    import ray.data as rd

    from ..util import hash_rollup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "text"])

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({"lang": batch["lang"],
                         "n_chars": pc.utf8_length(batch["text"])})

    def thr_part(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lang, sub in g.groupby("lang", sort=False):
            a = np.sort(sub["n_chars"].to_numpy(dtype=np.int64))
            rows.append((lang, int(a[(len(a) + 3) // 4 - 1])))
        return pd.DataFrame(rows, columns=["lang", "thr"])

    thr_ds = hash_rollup(ds.map_batches(project, batch_format="pyarrow"),
                         ["lang"], thr_part, npartitions=4)
    # bounded cardinality (one row per language) -> safe to collect
    thr = {r["lang"]: r["thr"] for r in thr_ds.take_all()}
    thr_ref = ray.put(thr)

    def gate(batch: pa.Table) -> pa.Table:
        t = ray.get(thr_ref)
        langs = batch.column("lang").to_pylist()
        n = pc.utf8_length(batch["text"]).to_numpy(zero_copy_only=False)
        lim = np.array([t[lg] for lg in langs], dtype=np.int64)
        keep = pa.array(n >= lim)
        out = pa.table({"doc_id": batch["doc_id"], "lang": batch["lang"],
                        "n_chars": pa.array(n, pa.int64())})
        return out.filter(keep)

    return ds.map_batches(gate, batch_format="pyarrow")


PERCENTILE_GATE_SQL = """
WITH m AS (
  SELECT doc_id, lang, length(text)::BIGINT AS n_chars FROM documents),
r AS (
  SELECT lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars) AS rnk,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM m),
t AS (SELECT lang, n_chars AS thr FROM r WHERE rnk = (n + 3) // 4)
SELECT m.doc_id, m.lang, m.n_chars
FROM m JOIN t USING (lang) WHERE m.n_chars >= t.thr
"""


# ---------------------------------------------------------------------------
# per-host crawl quota (SURT-keyed site cap)
# ---------------------------------------------------------------------------

HOST_QUOTA_K = 3


def host_quota(sf_dir: str, k: int = HOST_QUOTA_K):
    """Per-site document cap: at most ``k`` docs per canonical SURT host
    (ordered by doc_id — crawl order in the synthetic corpus), the quota
    stage that stops a single domain dominating a training mix.

    Scale shape: the host key derives in-stream (url -> canonical host,
    functions/urls), each block pre-trims to its local first-k per host
    (combiner — at most k rows per host leave any block), then ONE hash
    exchange on host and a vectorized per-partition head(k) + rank.
    Host cardinality is unbounded (one key per site), hence hash_rollup,
    not a bounded-final merge."""
    import ray.data as rd

    from ..functions import urls as urlfn
    from ..sources import synth
    from ..util import hash_rollup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def hosts(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id").to_numpy(zero_copy_only=False)
        us = synth.derive_url(did)
        hs = [urlfn.canonicalize(u)[0] for u in us]
        return pa.table({"host": pa.array(hs, pa.string()),
                         "doc_id": batch["doc_id"]})

    def cap(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["host", "doc_id"], kind="mergesort")
        return g.groupby("host", sort=False).head(k)

    partials = ds.map_batches(hosts, batch_format="pyarrow") \
        .map_batches(cap, batch_format="pandas")

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = cap(g).reset_index(drop=True)
        g["rank"] = (g.groupby("host", sort=False).cumcount() + 1) \
            .astype("int64")
        return g

    return hash_rollup(partials, ["host"], finish)


def host_quota_sql(k: int = HOST_QUOTA_K) -> str:
    from ..functions import urls as urlfn
    from ..sources import synth

    return f"""
WITH pages AS (SELECT doc_id, {synth.url_sql()} AS url FROM documents),
h AS (SELECT doc_id, {urlfn.surt_host_sql('url')} AS host FROM pages),
r AS (SELECT host, doc_id,
             ROW_NUMBER() OVER (PARTITION BY host ORDER BY doc_id) AS rank
      FROM h)
SELECT host, doc_id, rank FROM r WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# end-to-end curation pipeline (the composed LLM-data path)
# ---------------------------------------------------------------------------

CURATION_HOST_K = 10
CURATION_LANG_N = 50


def curation_pipeline(sf_dir: str, *, host_k: int = CURATION_HOST_K,
                      lang_n: int = CURATION_LANG_N, npartitions: int | None = None):
    """The composed training-data path a user of the engine actually runs,
    as ONE streaming pipeline over the noisy corpus:

      quality gate -> exact dedup -> per-host quota -> stratified mix

    Stage A is a single fused pass (gate + content hash + host key — one
    text scan, not three); dedup and quota are one hash exchange each
    (content_hash, then host); the final per-lang mix is a bounded
    combiner + single merge task (langs x n rows total). Every rule is
    integer/string-exact, so the whole composition has ONE bit-exact SQL
    twin — operator composition, not just operators, is oracle-checked.
    Output: (lang, doc_id, host, mix_rank)."""
    from ..sources import synth
    from ..util import hash_rollup
    from .relational import _merge_small

    ds = noisy_documents(sf_dir)

    def gate_hash(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        keep = []
        hashes = []
        for t in texts:
            m = textfn.quality_metrics(t)
            ok = (QF_MIN_CHARS <= m["n_chars"] <= QF_MAX_CHARS
                  and textfn.token_count(t) >= QF_MIN_TOKENS
                  and m["n_punct"] * 100 < m["n_chars"] * QF_MAX_PUNCT_PER_CHAR_PCT
                  and m["n_digit"] * 100 < m["n_chars"] * QF_MAX_DIGIT_PER_CHAR_PCT)
            keep.append(ok)
            hashes.append(textfn.fingerprint_md5(t) if ok else "")
        did = batch.column("doc_id").to_numpy(zero_copy_only=False)
        t = pa.table({
            "doc_id": batch["doc_id"],
            "lang": batch["lang"],
            "content_hash": pa.array(hashes, pa.string()),
            "host": pa.array(synth.derive_domain(did), pa.string()),
        })
        return t.filter(pa.array(keep))

    gated = ds.map_batches(gate_hash, batch_format="pyarrow")

    def dedup_min(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["content_hash", "doc_id"], kind="mergesort")
        return g.drop_duplicates("content_hash", keep="first") \
            .drop(columns=["content_hash"])

    deduped = hash_rollup(gated, ["content_hash"], dedup_min,
                          npartitions=npartitions)

    def quota(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["host", "doc_id"], kind="mergesort")
        return g.groupby("host", sort=False).head(host_k)

    # quota is its own combiner (local first-k ⊇ global first-k), so
    # pre-cap per block before the host exchange — at most host_k rows
    # per host per block ship, instead of the whole deduped stream
    quotaed = hash_rollup(
        deduped.map_batches(quota, batch_format="pandas"),
        ["host"], quota, npartitions=npartitions)

    def mix_partial(g: pd.DataFrame) -> pd.DataFrame:
        did = g["doc_id"].to_numpy(dtype=np.int64)
        g = g.assign(key=(did * 2654435761) % (1 << 31))
        g = g.sort_values(["lang", "key", "doc_id"], kind="mergesort")
        return g.groupby("lang", sort=False).head(lang_n)

    partials = quotaed.map_batches(mix_partial, batch_format="pandas")

    def mix_final(t: pa.Table) -> pa.Table:
        g = mix_partial(t.to_pandas()).reset_index(drop=True)
        g["mix_rank"] = (g.groupby("lang", sort=False).cumcount() + 1) \
            .astype("int64")
        return pa.Table.from_pandas(
            g[["lang", "doc_id", "host", "mix_rank"]], preserve_index=False)

    return _merge_small(partials, mix_final)


def curation_pipeline_sql(host_k: int = CURATION_HOST_K,
                          lang_n: int = CURATION_LANG_N) -> str:
    from ..sources import synth

    # gate conditions mirror QUALITY_FILTER_SQL's, inlined over the noisy
    # corpus (same QF_* constants, same integer arithmetic)
    return f"""
WITH noisy AS ({NOISY_DOCUMENTS_SQL}),
m AS (
  SELECT doc_id, lang, text,
         length(text) AS n_chars,
         (length(text) - length(regexp_replace(text, '[.,;:!?''"()\\[\\]{{}}-]', '', 'g'))) AS n_punct,
         (length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) AS n_digit,
         len(list_filter(str_split(text, ' '), x -> x <> '')) AS n_tokens
  FROM noisy),
kept AS (
  SELECT doc_id, lang, text FROM m
  WHERE n_chars >= {QF_MIN_CHARS} AND n_chars <= {QF_MAX_CHARS}
    AND n_tokens >= {QF_MIN_TOKENS}
    AND n_punct * 100 < n_chars * {QF_MAX_PUNCT_PER_CHAR_PCT}
    AND n_digit * 100 < n_chars * {QF_MAX_DIGIT_PER_CHAR_PCT}),
ded AS (
  SELECT doc_id, lang FROM (
    SELECT doc_id, lang,
           ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM kept) WHERE rn = 1),
h AS (SELECT doc_id, lang, {synth.domain_sql()} AS host FROM ded),
qt AS (
  SELECT doc_id, lang, host FROM (
    SELECT doc_id, lang, host,
           ROW_NUMBER() OVER (PARTITION BY host ORDER BY doc_id) AS hr
    FROM h) WHERE hr <= {host_k})
SELECT lang, doc_id, host, mix_rank FROM (
  SELECT lang, doc_id, host,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY (doc_id * 2654435761) % {1 << 31}, doc_id) AS mix_rank
  FROM qt) WHERE mix_rank <= {lang_n}
"""


# ---------------------------------------------------------------------------
# unigram surprisal (model-based scoring with a broadcast vocabulary)
# ---------------------------------------------------------------------------

SURPRISAL_V = 10


def unigram_surprisal(sf_dir: str, v: int = SURPRISAL_V):
    """Model-based document scoring with a corpus-DERIVED broadcast model:
    phase 1 trains the 'model' (the top-``v`` global tokens ranked by
    frequency, ties broken by token), phase 2 scores every document as the
    sum of its tokens' ranks (out-of-vocabulary tokens cost ``v + 1``) —
    the integer stand-in for the n-gram-LM perplexity filter a quality
    pipeline runs, exercising the same train-broadcast-score topology.

    Scale shape: training pre-counts tokens per block, ONE hash exchange
    on token, bounded top-``v`` final (`_merge_small`); the v-row model is
    a `ray.put` broadcast; scoring explodes tokens per batch and reduces
    with a vectorized map + groupby-sum — zero additional shuffles.
    All-integer, so the SQL twin is bit-exact."""
    import ray

    import ray.data as rd

    from .relational import _merge_small
    from ..util import hash_rollup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def precount(batch: pa.Table) -> pa.Table:
        toks = [w for t in batch.column("text").to_pylist()
                for w in t.split(" ") if w]
        t = pa.table({"tok": pa.array(toks, pa.string())})
        g = pa.TableGroupBy(t, ["tok"]).aggregate([([], "count_all")])
        return g.rename_columns(["tok", "n"])

    counts = hash_rollup(
        ds.map_batches(precount, batch_format="pyarrow"), ["tok"],
        lambda t: pa.TableGroupBy(t, ["tok"]).aggregate([("n", "sum")])
        .rename_columns(["tok", "n"]),
        batch_format="pyarrow")

    def topv(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "tok"], ascending=[False, True],
                          kind="mergesort")
        return g.head(v)

    def rank(t: pa.Table) -> pa.Table:
        g = topv(t.to_pandas()).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return pa.Table.from_pandas(g[["tok", "rank"]], preserve_index=False)

    vocab_ds = _merge_small(
        counts.map_batches(topv, batch_format="pandas"), rank)
    vocab = {r["tok"]: r["rank"] for r in vocab_ds.take_all()}
    vocab_ref = ray.put(vocab)

    def score(batch: pa.Table) -> pa.Table:
        vmap = ray.get(vocab_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        out_id, out_tok = [], []
        for did, t in zip(ids, texts):
            toks = [w for w in t.split(" ") if w]
            out_id.extend([int(did)] * len(toks))
            out_tok.extend(toks)
        e = pd.DataFrame({"doc_id": out_id, "tok": out_tok})
        e["rank"] = e["tok"].map(vmap).fillna(v + 1).astype(np.int64)
        agg = e.groupby("doc_id", sort=False)["rank"] \
            .agg(surprisal="sum", n_tokens="size")
        sur = pd.Series(ids, dtype=np.int64).map(agg["surprisal"]) \
            .fillna(0).astype(np.int64)
        ntk = pd.Series(ids, dtype=np.int64).map(agg["n_tokens"]) \
            .fillna(0).astype(np.int64)
        return pa.table({"doc_id": batch["doc_id"],
                         "surprisal": pa.array(sur.to_numpy()),
                         "n_tokens": pa.array(ntk.to_numpy())})

    return ds.map_batches(score, batch_format="pyarrow")


def unigram_surprisal_sql(v: int = SURPRISAL_V) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, tok
  FROM documents, UNNEST(list_filter(str_split(text, ' '), x -> x <> ''))
       AS t(tok)),
counts AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
vocab AS (
  SELECT tok, rank FROM (
    SELECT tok, ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rank
    FROM counts) WHERE rank <= {v}),
s AS (
  SELECT toks.doc_id, SUM(COALESCE(vocab.rank, {v + 1})) AS surprisal,
         COUNT(*) AS n_tokens
  FROM toks LEFT JOIN vocab USING (tok) GROUP BY toks.doc_id)
SELECT d.doc_id,
       COALESCE(s.surprisal, 0)::BIGINT AS surprisal,
       COALESCE(s.n_tokens, 0)::BIGINT AS n_tokens
FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
"""


# ---------------------------------------------------------------------------
# counting median (exact order statistic WITH a combiner)
# ---------------------------------------------------------------------------

def counting_median(sf_dir: str):
    """Exact per-lang median document length via COUNTING, not sorting:
    because the value domain is bounded (document lengths are small
    integers), per-block (lang, n_chars, count) histograms are a perfect
    combiner — the exchange ships O(langs × distinct_lengths) rows no
    matter the corpus size, where the raw-pair plan (`quality_quartiles`,
    kept as the unbounded-domain counterpart) ships one row per document.
    The per-lang merge sums histograms, cumsums in value order, and reads
    the value at rank ``(n+1)//2`` (lower median — integer, exact twin).
    Output (lang, median_chars, n_docs)."""
    import ray.data as rd

    from ..util import hash_rollup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "text"])

    def hist(batch: pa.Table) -> pa.Table:
        t = pa.table({"lang": batch["lang"],
                      "n_chars": pc.utf8_length(batch["text"])})
        g = pa.TableGroupBy(t, ["lang", "n_chars"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["lang", "n_chars", "cnt"])

    partials = ds.map_batches(hist, batch_format="pyarrow")

    def median(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["lang", "n_chars"], sort=False)["cnt"].sum() \
            .reset_index()
        g = g.sort_values(["lang", "n_chars"], kind="mergesort")
        rows = []
        for lang, sub in g.groupby("lang", sort=False):
            cum = sub["cnt"].to_numpy(dtype=np.int64).cumsum()
            n = int(cum[-1])
            target = (n + 1) // 2
            idx = int(np.searchsorted(cum, target))
            rows.append((lang, int(sub["n_chars"].iloc[idx]), n))
        return pd.DataFrame(rows,
                            columns=["lang", "median_chars", "n_docs"])

    return hash_rollup(partials, ["lang"], median, npartitions=4)


COUNTING_MEDIAN_SQL = """
WITH m AS (SELECT lang, length(text)::BIGINT AS n_chars FROM documents),
r AS (SELECT lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars) AS rnk,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM m)
SELECT lang, n_chars AS median_chars, CAST(n AS BIGINT) AS n_docs
FROM r WHERE rnk = (n + 1) // 2
"""


def log_quantiles(sf_dir: str):
    """Mergeable log2-histogram quantile sketch (the HdrHistogram /
    DDSketch family): per-lang approximate p50/p90/p99 of document length
    via power-of-two buckets — ``bucket = bit_length(n_chars)``, reported
    value the bucket lower bound ``2^(bucket-1)``, relative error <= 2x by
    construction. Completes the quantile family: ``counting_median`` is
    exact but needs a BOUNDED value domain, ``percentile_gate`` is exact
    but ships one histogram row per distinct value; the log sketch's
    register count is <= langs x 64 AT ANY SCALE and any value domain —
    the shape production latency/size monitoring uses at 10^12 rows.

    Determinism/exactness of the sketch itself: the bucket function is
    integer-exact on BOTH engines — numpy ``frexp`` exponents (exact for
    ints < 2^53) == python ``int.bit_length`` == DuckDB
    ``length(bin(x))`` — and quantile ranks are ``ceil(q*n)`` in pure
    integer arithmetic, so the twin is hash-checked, not rows-only.

    Scale shape: per-block (lang, bucket) Arrow pre-counts (the perfect
    combiner — bounded rows per block), ONE tiny hash exchange on lang,
    vectorized per-lang cumulative-rank readout. Output
    (lang, n_docs, p50_lb, p90_lb, p99_lb), all BIGINT."""
    import ray.data as rd

    from ..util import hash_rollup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "n_chars"])

    def hist(batch: pa.Table) -> pa.Table:
        x = batch.column("n_chars").to_numpy(zero_copy_only=False)
        bits = np.frexp(np.maximum(x, 1).astype(np.float64))[1]
        t = pa.table({"lang": batch["lang"],
                      "bucket": pa.array(bits.astype(np.int64), pa.int64())})
        g = pa.TableGroupBy(t, ["lang", "bucket"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["lang", "bucket", "cnt"])

    partials = ds.map_batches(hist, batch_format="pyarrow")

    def readout(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["lang", "bucket"], sort=False)["cnt"].sum() \
            .reset_index().sort_values(["lang", "bucket"], kind="mergesort")
        rows = []
        for lang, sub in g.groupby("lang", sort=False):
            cum = sub["cnt"].to_numpy(dtype=np.int64).cumsum()
            n = int(cum[-1])
            buckets = sub["bucket"].to_numpy(dtype=np.int64)
            lbs = []
            for num, den in ((1, 2), (9, 10), (99, 100)):
                rank = (n * num + den - 1) // den  # ceil(q*n), integer
                b = int(buckets[np.searchsorted(cum, rank)])
                lbs.append(1 << (b - 1))
            rows.append((lang, n, *lbs))
        return pd.DataFrame(rows, columns=["lang", "n_docs", "p50_lb",
                                           "p90_lb", "p99_lb"])

    return hash_rollup(partials, ["lang"], readout, npartitions=4)


LOG_QUANTILES_SQL = """
WITH h AS (
  SELECT lang, length(bin(greatest(n_chars, 1))) AS bucket, COUNT(*) AS cnt
  FROM documents GROUP BY 1, 2
),
c AS (
  SELECT lang, bucket, cnt,
         SUM(cnt) OVER (PARTITION BY lang ORDER BY bucket) AS cum,
         SUM(cnt) OVER (PARTITION BY lang) AS n
  FROM h
)
SELECT lang, CAST(MAX(n) AS BIGINT) AS n_docs,
       CAST(MIN(CASE WHEN cum >= (n * 1 + 1) // 2
                THEN CAST(1 AS BIGINT) << CAST(bucket - 1 AS INTEGER) END)
            AS BIGINT) AS p50_lb,
       CAST(MIN(CASE WHEN cum >= (n * 9 + 9) // 10
                THEN CAST(1 AS BIGINT) << CAST(bucket - 1 AS INTEGER) END)
            AS BIGINT) AS p90_lb,
       CAST(MIN(CASE WHEN cum >= (n * 99 + 99) // 100
                THEN CAST(1 AS BIGINT) << CAST(bucket - 1 AS INTEGER) END)
            AS BIGINT) AS p99_lb
FROM c GROUP BY lang
"""


# ---------------------------------------------------------------------------
# incremental dedup (state merge — no rescan of the old corpus)
# ---------------------------------------------------------------------------

def dedup_incremental(sf_dir: str):
    """Incremental exact dedup: yesterday's WINNER STATE (content_hash ->
    keep_id over the base corpus) merges with today's DELTA (the injected
    duplicate rows) in one exchange — the old corpus is never rescanned;
    only its pre-reduced winner table flows. This is how a daily crawl
    pipeline actually runs dedup at 10^12 docs: the winner state is the
    persistent sketch, each day's delta co-partitions against it.

    Provably equal to the full recompute: winners(old ∪ delta) =
    min-merge(winners(old), winners(delta)) because min is associative —
    the oracle twin IS the full-corpus QUALIFY (`dedup_exact`'s SQL), so
    the equality is hash-checked, not asserted."""
    import ray.data as rd

    from ..stages.dedup import add_content_hash, dedup_exact

    base = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    old_state = dedup_exact(base)            # (content_hash, keep_id)

    def delta_only(batch: pa.Table) -> pa.Table:
        """Today's rows: the exact/near duplicates noisy_documents injects
        (id-shifted copies), WITHOUT the base corpus."""
        did_np = batch.column("doc_id").to_numpy(zero_copy_only=False)
        exact = batch.filter(pa.array(did_np % EXACT_DUP_MOD == 0))
        exact = pa.table({
            "doc_id": pc.add(exact["doc_id"],
                             pa.scalar(1_000_000, pa.int64())),
            "text": exact["text"],
        })
        near = batch.filter(pa.array(did_np % NEAR_DUP_MOD == 0))
        near = pa.table({
            "doc_id": pc.add(near["doc_id"],
                             pa.scalar(2_000_000, pa.int64())),
            "text": pc.binary_join_element_wise(
                near["text"], pa.scalar(NEAR_DUP_SUFFIX), ""),
        })
        return pa.concat_tables([exact, near])

    delta = base.map_batches(delta_only, batch_format="pyarrow")
    delta_hashed = add_content_hash(delta)

    def delta_partial(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch.select(["content_hash", "doc_id"]),
                            ["content_hash"]).aggregate([("doc_id", "min")])
        return g.rename_columns(["content_hash", "keep_id"])

    merged = old_state.union(
        delta_hashed.map_batches(delta_partial, batch_format="pyarrow"))

    from ..util import hash_rollup

    def min_merge(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["content_hash"]).aggregate(
            [("keep_id", "min")])
        return g.rename_columns(["content_hash", "keep_id"])

    return hash_rollup(merged, ["content_hash"], min_merge,
                       batch_format="pyarrow")


# ---------------------------------------------------------------------------
# range partitioning (the distributed total-order primitive)
# ---------------------------------------------------------------------------

RANGE_BUCKETS = 8


def range_partition(sf_dir: str, buckets: int = RANGE_BUCKETS):
    """Assign every document a RANGE bucket by length — the split-point
    computation behind any distributed sort / range-partitioned write.
    Production sorts sample their split points; here the bounded value
    domain lets the splits be EXACT order statistics (the counting-
    histogram trick of :func:`counting_median`, globally), so bucket
    assignment — and therefore the whole partitioner — has a bit-exact
    SQL twin instead of a sampling tolerance.

    Phase 1: per-block (n_chars, count) histograms -> one bounded merge
    -> thresholds at ranks ceil(j*n/buckets); phase 2 broadcasts the
    (buckets-1)-value split table via ray.put and assigns
    ``bucket = #{thresholds < n_chars}`` vectorized (np.searchsorted).
    Output (doc_id, n_chars, bucket); a range-partitioned write is
    ``.write_parquet(partition_cols=['bucket'])`` on top."""
    import ray

    import ray.data as rd

    from .relational import _merge_small

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def hist(batch: pa.Table) -> pa.Table:
        t = pa.table({"n_chars": pc.utf8_length(batch["text"])})
        g = pa.TableGroupBy(t, ["n_chars"]).aggregate([([], "count_all")])
        return g.rename_columns(["n_chars", "cnt"])

    def splits(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("n_chars", sort=True)["cnt"].sum()
        vals = g.index.to_numpy(dtype=np.int64)
        cum = g.to_numpy(dtype=np.int64).cumsum()
        n = int(cum[-1])
        ranks = [-(-j * n // buckets) for j in range(1, buckets)]  # ceil
        thr = vals[np.searchsorted(cum, ranks)]
        return pa.table({"j": pa.array(np.arange(1, buckets), pa.int64()),
                         "thr": pa.array(thr, pa.int64())})

    thr_ds = _merge_small(ds.map_batches(hist, batch_format="pyarrow"),
                          splits)
    thr = np.array([r["thr"] for r in thr_ds.take_all()], dtype=np.int64)
    thr_ref = ray.put(np.sort(thr))

    def assign(batch: pa.Table) -> pa.Table:
        t = ray.get(thr_ref)
        n = pc.utf8_length(batch["text"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = np.searchsorted(t, n, side="left")  # = #{thr < n} given sort
        return pa.table({"doc_id": batch["doc_id"],
                         "n_chars": pa.array(n),
                         "bucket": pa.array(b.astype(np.int64))})

    return ds.map_batches(assign, batch_format="pyarrow")


def range_partition_sql(buckets: int = RANGE_BUCKETS) -> str:
    return f"""
WITH m AS (SELECT doc_id, length(text)::BIGINT AS n_chars FROM documents),
r AS (SELECT n_chars,
             ROW_NUMBER() OVER (ORDER BY n_chars) AS rnk,
             COUNT(*) OVER () AS n
      FROM m),
t AS (SELECT n_chars AS thr FROM r, (SELECT UNNEST(range(1, {buckets})) AS j)
      -- ceil(j*n/buckets) via positive-operand division: DuckDB's //
      -- TRUNCATES (unlike python's floor), so -((-x)//y) is floor, not ceil
      WHERE rnk = (j * n + {buckets - 1}) // {buckets})
SELECT m.doc_id, m.n_chars,
       (SELECT COUNT(*) FROM t WHERE t.thr < m.n_chars)::BIGINT AS bucket
FROM m
"""


# ---------------------------------------------------------------------------
# sequence packing (token-budget concat-and-chunk)
# ---------------------------------------------------------------------------

PACK_BUDGET = 256          # tokens per training sequence (chunk)
PACK_NPARTS = 16           # doc_id range partitions for the prefix scan


def pack_sequences(sf_dir: str, budget: int = PACK_BUDGET,
                   nparts: int = PACK_NPARTS):
    """Concat-and-chunk sequence packing — the LLM-training batch-prep op:
    all documents are (logically) concatenated in doc_id order and cut
    into fixed ``budget``-token sequences; each doc maps to its global
    token offset and the chunk range it lands in.

    Output per doc (n_tokens > 0): (doc_id, n_tokens, tok_start,
    chunk_first, chunk_last, n_chunks) where tok_start is the EXCLUSIVE
    prefix sum of token counts in doc_id order, chunk_first/last =
    floor(tok_start / budget) / floor((tok_start + n_tokens - 1) / budget).

    Scale shape — a distributed exclusive prefix sum (same two-phase scan
    as events.late_events, reference has no analogue; SURVEY §2.10 graft):
    1. slim (doc_id, n_tokens, part) rows stream out of the text scan
       (text column dropped immediately); per-block pre-reduced
       (part, sum) partials are the ONLY driver collect (nparts ints);
    2. the exclusive prefix over partition sums broadcasts back (ray.put);
       one hash exchange co-locates each doc_id range partition, which
       sorts locally and adds its broadcast base — no global sort, no
       corpus-size driver state, text scanned twice (the classic
       recompute-vs-checkpoint trade; at corpus scale checkpoint the slim
       rows to parquet instead and feed both phases from it)."""
    import ray
    import ray.data as rd

    import pyarrow.parquet as pq

    from ..util import hash_rollup

    span = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def slim_rows():
        ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])

        def fn(batch: pa.Table) -> pa.Table:
            texts = batch.column("text").to_pylist()
            did = batch.column("doc_id").to_numpy(zero_copy_only=False)
            nt = np.array([textfn.token_count(t) for t in texts],
                          dtype=np.int64)
            part = np.minimum(did * nparts // span, nparts - 1)
            return pa.table({
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(nt),
                "part": pa.array(part.astype(np.int64)),
            })

        return ds.map_batches(fn, batch_format="pyarrow")

    # phase 1: per-block partials -> (part, tok_sum); tiny driver collect
    def part_sum(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(b.select(["part", "n_tokens"]),
                            ["part"]).aggregate([("n_tokens", "sum")])
        return g.rename_columns(["part", "tok_sum"])

    sums = slim_rows().map_batches(part_sum, batch_format="pyarrow") \
        .to_pandas().groupby("part", sort=True)["tok_sum"].sum()
    base = {}
    running = 0
    for p in range(nparts):
        base[p] = running
        running += int(sums.get(p, 0))
    base_ref = ray.put(base)

    # phase 2: co-locate doc_id ranges, local exclusive cumsum + base
    def scan(t: pa.Table) -> pa.Table:
        bases = ray.get(base_ref) if not isinstance(base_ref, dict) \
            else base_ref
        df = t.to_pandas()
        outs = []
        for p, sub in df.groupby("part", sort=False):
            sub = sub.sort_values("doc_id", kind="mergesort")
            nt = sub["n_tokens"].to_numpy(dtype=np.int64)
            start = bases[int(p)] + np.concatenate(
                ([0], np.cumsum(nt)[:-1]))
            keep = nt > 0
            cf = start[keep] // budget
            cl = (start[keep] + nt[keep] - 1) // budget
            outs.append(pa.table({
                "doc_id": pa.array(sub["doc_id"].to_numpy()[keep],
                                   pa.int64()),
                "n_tokens": pa.array(nt[keep]),
                "tok_start": pa.array(start[keep]),
                "chunk_first": pa.array(cf),
                "chunk_last": pa.array(cl),
                "n_chunks": pa.array(cl - cf + 1),
            }))
        return pa.concat_tables(outs) if outs else pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "tok_start": pa.array([], pa.int64()),
            "chunk_first": pa.array([], pa.int64()),
            "chunk_last": pa.array([], pa.int64()),
            "n_chunks": pa.array([], pa.int64()),
        })

    return hash_rollup(slim_rows(), ["part"], scan,
                       batch_format="pyarrow")


def pack_sequences_sql(budget: int = PACK_BUDGET) -> str:
    """Exact window-function twin: same token count, same exclusive prefix
    sum in doc_id order, same integer chunk arithmetic."""
    return f"""
WITH t AS (
  SELECT doc_id,
         len(list_filter(str_split(text, ' '), x -> x <> ''))::BIGINT
             AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
             AS tok_start
  FROM t)
SELECT doc_id, n_tokens, tok_start,
       (tok_start // {budget})::BIGINT AS chunk_first,
       ((tok_start + n_tokens - 1) // {budget})::BIGINT AS chunk_last,
       ((tok_start + n_tokens - 1) // {budget}
        - tok_start // {budget} + 1)::BIGINT AS n_chunks
FROM c
WHERE n_tokens > 0
"""


# ---------------------------------------------------------------------------
# mixture scheduling (weighted corpus interleave)
# ---------------------------------------------------------------------------

MIX_WEIGHTS = {"en": 4, "es": 2, "fr": 2, "de": 1, "ne": 1}


def _mix_lcm(w: dict[str, int]) -> int:
    """lcm of all weights (and the default weight 1); vt strides
    LCM // w_l stay integral for ANY caller-supplied weights."""
    import math

    out = 1
    for x in w.values():
        out = math.lcm(out, int(x))
    return out


MIX_LCM = _mix_lcm(MIX_WEIGHTS)  # = 4 for the default mix


def mixture_schedule(sf_dir: str, weights: dict[str, int] | None = None,
                     nparts: int = PACK_NPARTS):
    """Deterministic weighted data-mixing schedule (stride scheduling):
    each language stream l advances a virtual clock by LCM/w_l per doc, and
    training consumes docs in (vt, lang, rank) order — so language l gets
    w_l/Σw of every training window without any shuffling of the docs
    themselves.

    Output: (doc_id, lang, lang_rank, vt) where lang_rank is the doc's
    0-based position within its language (doc_id order) and
    vt = (lang_rank + 1) * (LCM // w_l). Consumers range-partition by vt
    (textops.range_partition is the primitive) to materialize the order;
    emitting vt instead of a global row number keeps the operator free of
    any global sort.

    Scale shape: lang_rank is an exclusive prefix COUNT per language —
    the same two-phase scan as pack_sequences, with a (lang x nparts)
    count matrix as the only driver state. Unknown langs get weight 1."""
    import ray
    import ray.data as rd

    import pyarrow.parquet as pq

    from ..util import hash_rollup

    w = dict(weights or MIX_WEIGHTS)
    lcm = _mix_lcm(w)
    span = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def slim_rows():
        ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "lang"])

        def fn(batch: pa.Table) -> pa.Table:
            did = batch.column("doc_id").to_numpy(zero_copy_only=False)
            part = np.minimum(did * nparts // span, nparts - 1)
            return batch.append_column(
                "part", pa.array(part.astype(np.int64)))

        return ds.map_batches(fn, batch_format="pyarrow")

    # phase 1: (part, lang) doc counts; tiny driver collect
    def part_counts(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(b.select(["part", "lang"]),
                            ["part", "lang"]).aggregate([([], "count_all")])
        return g.rename_columns(["part", "lang", "n"])

    counts = slim_rows().map_batches(part_counts, batch_format="pyarrow") \
        .to_pandas().groupby(["part", "lang"], sort=True)["n"].sum()
    base: dict[str, dict[int, int]] = {}
    for (p, lang), n in counts.items():
        base.setdefault(lang, {})
    for lang in base:
        running = 0
        for p in range(nparts):
            base[lang][p] = running
            running += int(counts.get((p, lang), 0))
    base_ref = ray.put(base)

    # phase 2: co-locate doc_id ranges; local per-lang rank + stride clock
    def scan(t: pa.Table) -> pa.Table:
        bases = ray.get(base_ref) if not isinstance(base_ref, dict) \
            else base_ref
        df = t.to_pandas()
        outs = []
        for p, sub in df.groupby("part", sort=False):
            sub = sub.sort_values("doc_id", kind="mergesort")
            local = sub.groupby("lang", sort=False).cumcount().to_numpy()
            langs = sub["lang"].to_numpy()
            rank = local + np.array([bases[l][int(p)] for l in langs],
                                    dtype=np.int64)
            stride = np.array([lcm // w.get(l, 1) for l in langs],
                              dtype=np.int64)
            outs.append(pa.table({
                "doc_id": pa.array(sub["doc_id"].to_numpy(), pa.int64()),
                "lang": pa.array(langs, pa.string()),
                "lang_rank": pa.array(rank),
                "vt": pa.array((rank + 1) * stride),
            }))
        return pa.concat_tables(outs) if outs else pa.table({
            "doc_id": pa.array([], pa.int64()),
            "lang": pa.array([], pa.string()),
            "lang_rank": pa.array([], pa.int64()),
            "vt": pa.array([], pa.int64()),
        })

    return hash_rollup(slim_rows(), ["part"], scan, batch_format="pyarrow")


def mixture_schedule_sql(weights: dict[str, int] | None = None) -> str:
    w = dict(weights or MIX_WEIGHTS)
    lcm = _mix_lcm(w)
    cases = " ".join(f"WHEN '{l}' THEN {lcm // wl}"
                     for l, wl in sorted(w.items()))
    return f"""
SELECT doc_id, lang,
       (ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) - 1)::BIGINT
           AS lang_rank,
       (ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id)
        * CASE lang {cases} ELSE {lcm} END)::BIGINT AS vt
FROM documents
"""


def chunk_occupancy(sf_dir: str, budget: int = PACK_BUDGET,
                    nparts: int = PACK_NPARTS):
    """Companion rollup to :func:`pack_sequences`: per training chunk, how
    many docs contribute and how many of its token slots are filled
    (the last chunk of the corpus may be partial). The doc->chunk explode
    is vectorized (np.repeat over per-doc chunk spans) and pre-reduced per
    block before ONE hash exchange on chunk — a doc never ships one row
    per token, only per (doc, chunk) overlap, and blocks ship per-chunk
    partial counts."""
    from ..util import hash_rollup

    packed = pack_sequences(sf_dir, budget=budget, nparts=nparts)

    def explode(b: pa.Table) -> pa.Table:
        cf = b.column("chunk_first").to_numpy(zero_copy_only=False)
        cl = b.column("chunk_last").to_numpy(zero_copy_only=False)
        ts = b.column("tok_start").to_numpy(zero_copy_only=False)
        nt = b.column("n_tokens").to_numpy(zero_copy_only=False)
        reps = (cl - cf + 1).astype(np.int64)
        # chunk ids per (doc, chunk) overlap
        chunk = np.repeat(cf, reps) + (
            np.arange(reps.sum(), dtype=np.int64)
            - np.repeat(np.concatenate(([0], np.cumsum(reps)[:-1])), reps))
        # tokens of the doc landing in this chunk: overlap of
        # [ts, ts+nt) with [chunk*budget, (chunk+1)*budget)
        dts = np.repeat(ts, reps)
        dnt = np.repeat(nt, reps)
        lo = np.maximum(dts, chunk * budget)
        hi = np.minimum(dts + dnt, (chunk + 1) * budget)
        t = pa.table({
            "chunk": pa.array(chunk),
            "n_docs_p": pa.array(np.ones(len(chunk), dtype=np.int64)),
            "n_tokens_p": pa.array(hi - lo),
        })
        g = pa.TableGroupBy(t, ["chunk"]).aggregate(
            [("n_docs_p", "sum"), ("n_tokens_p", "sum")])
        return g.rename_columns(["chunk", "n_docs", "n_tokens"])

    def merge(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["chunk"]).aggregate(
            [("n_docs", "sum"), ("n_tokens", "sum")])
        return g.rename_columns(["chunk", "n_docs", "n_tokens"])

    return hash_rollup(packed.map_batches(explode, batch_format="pyarrow"),
                       ["chunk"], merge, batch_format="pyarrow")


def chunk_occupancy_sql(budget: int = PACK_BUDGET) -> str:
    return f"""
WITH t AS (
  SELECT doc_id,
         len(list_filter(str_split(text, ' '), x -> x <> ''))::BIGINT
             AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
             AS tok_start
  FROM t WHERE n_tokens > 0),
x AS (
  SELECT doc_id, n_tokens, tok_start,
         unnest(range(tok_start // {budget},
                      (tok_start + n_tokens - 1) // {budget} + 1)) AS chunk
  FROM c)
SELECT chunk::BIGINT AS chunk, COUNT(*)::BIGINT AS n_docs,
       SUM(LEAST(tok_start + n_tokens, (chunk + 1) * {budget})
           - GREATEST(tok_start, chunk * {budget}))::BIGINT AS n_tokens
FROM x GROUP BY chunk
"""


# ---------------------------------------------------------------------------
# BM25 ranked retrieval (integer-exact scoring)
# ---------------------------------------------------------------------------

BM25_TERMS = ("hash", "join", "vector", "window")
BM25_K = 10
# Rational BM25 with k1 = 6/5, b = 3/4 evaluated in pure integer
# arithmetic so both engines floor identically:
#   r       = (1000 * dl * N) // T                   (length ratio, ~1000ths)
#   tfpart  = (22000*tf << 20) // (10000*tf + 3000 + 9*r)
#   idf     = ((2N + 2) << 16) // (2*df + 1)         (BM25+ style, >= 0)
#   score   = sum over query terms of idf * tfpart
# Overflow headroom (int64): idf <= (2N+2)<<16 / 3, tfpart < 2.2<<20, so
# score-per-term < N * 2^39 — safe to N ~ 10^6 docs per scoring domain; at
# larger N shrink the idf shift (both sides share the constant).
_BM25_IDF_SHIFT = 16
_BM25_TF_SHIFT = 20


def bm25_topk(sf_dir: str, terms: tuple[str, ...] = BM25_TERMS,
              k: int = BM25_K):
    """Top-``k`` documents by BM25 against a fixed query-term set — the
    ranked-retrieval op a curation pipeline uses for targeted corpus
    probes (postings/df are the same building blocks as ``postings`` /
    ``tfidf_terms``; reference analogue: attribute-filtered ordered reads,
    exposm SetAttributeFilter + ORDER BY).

    Scale shape: pass 1 streams the corpus once and pre-reduces each block
    to ONE stats row (doc count, token count, per-term document
    frequencies) — the driver merges nblocks tiny rows and broadcasts
    (N, T, df). Pass 2 scores every doc vectorized with the integer BM25
    above, keeps a per-block top-k partial (tie-deterministic lexsort per
    the repo float rule — the score is already an exact integer), and ONE
    single-task merge ranks the k winners. No shuffle of doc rows at any
    corpus size."""
    import ray.data as rd

    from .relational import _merge_small

    terms = tuple(terms)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def stats_partial(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        n_docs = len(texts)
        total = 0
        df = np.zeros(len(terms), dtype=np.int64)
        for txt in texts:
            toks = [w for w in (txt or "").split(" ") if w]
            total += len(toks)
            if toks:
                tokset = set(toks)
                for i, t in enumerate(terms):
                    if t in tokset:
                        df[i] += 1
        cols = {"n_docs": pa.array([n_docs], pa.int64()),
                "total_tokens": pa.array([total], pa.int64())}
        for i in range(len(terms)):
            cols[f"df_{i}"] = pa.array([int(df[i])], pa.int64())
        return pa.table(cols)

    st = docs.map_batches(stats_partial, batch_format="pyarrow").to_pandas()
    n_corpus = int(st["n_docs"].sum())
    t_corpus = int(st["total_tokens"].sum())
    df = np.array([int(st[f"df_{i}"].sum()) for i in range(len(terms))],
                  dtype=np.int64)
    idf = ((2 * n_corpus + 2) << _BM25_IDF_SHIFT) // (2 * df + 1)

    def score_partial(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        did = b.column("doc_id").to_numpy(zero_copy_only=False)
        dl = np.zeros(len(texts), dtype=np.int64)
        tf = np.zeros((len(texts), len(terms)), dtype=np.int64)
        for row, txt in enumerate(texts):
            toks = [w for w in (txt or "").split(" ") if w]
            dl[row] = len(toks)
            for i, t in enumerate(terms):
                tf[row, i] = toks.count(t)
        r = (1000 * dl * n_corpus) // max(t_corpus, 1)
        den = 10000 * tf + 3000 + 9 * r[:, None]
        tfpart = ((22000 * tf) << _BM25_TF_SHIFT) // den
        score = (tfpart * idf[None, :]).sum(axis=1)
        keep = score > 0
        did, score = did[keep], score[keep]
        top = np.lexsort((did, -score))[:k]
        return pa.table({"doc_id": pa.array(did[top], pa.int64()),
                         "score": pa.array(score[top], pa.int64())})

    def final(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        score = t.column("score").to_numpy(zero_copy_only=False)
        top = np.lexsort((did, -score))[:k]
        return pa.table({
            "doc_id": pa.array(did[top], pa.int64()),
            "score": pa.array(score[top], pa.int64()),
            "rank": pa.array(np.arange(1, len(top) + 1, dtype=np.int64)),
        })

    return _merge_small(
        docs.map_batches(score_partial, batch_format="pyarrow"), final)


def bm25_topk_sql(terms: tuple[str, ...] = BM25_TERMS,
                  k: int = BM25_K) -> str:
    tlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH toks AS (
  SELECT doc_id, tok
  FROM documents, UNNEST(list_filter(str_split(text, ' '), x -> x <> ''))
       AS t(tok)),
n AS (SELECT COUNT(*)::BIGINT AS n FROM documents),
tt AS (SELECT COUNT(*)::BIGINT AS t FROM toks),
dl AS (SELECT doc_id, COUNT(*)::BIGINT AS dl FROM toks GROUP BY doc_id),
q AS (SELECT UNNEST([{tlist}]) AS term),
df AS (
  SELECT q.term, COUNT(DISTINCT toks.doc_id)::BIGINT AS df
  FROM q LEFT JOIN toks ON toks.tok = q.term GROUP BY q.term),
tf AS (
  SELECT doc_id, tok AS term, COUNT(*)::BIGINT AS tf
  FROM toks WHERE tok IN ({tlist}) GROUP BY doc_id, tok),
scored AS (
  SELECT tf.doc_id,
         SUM((((2 * n.n + 2) << {_BM25_IDF_SHIFT}) // (2 * df.df + 1))
             * (((22000 * tf.tf) << {_BM25_TF_SHIFT})
                // (10000 * tf.tf + 3000
                    + 9 * ((1000 * dl.dl * n.n) // GREATEST(tt.t, 1)))))
           ::BIGINT AS score
  FROM tf
  JOIN df USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN n CROSS JOIN tt
  GROUP BY tf.doc_id)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM scored WHERE score > 0)
WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# winnowing fingerprints (MOSS-style positional document fingerprints)
# ---------------------------------------------------------------------------

WINNOW_K = 8    # char k-gram width (bytes; the corpus is ASCII)
WINNOW_W = 4    # winnowing window: one pick per W consecutive gram hashes
_WINNOW_MOD = 1 << 61        # Karp-Rabin modulus (same as rolling twin)
_WINNOW_HBITS = 40           # hash truncated to 40 bits so that
_WINNOW_PBITS = 21           # (h40 << 21 | pos) fits int64 exactly
_WINNOW_PMASK = (1 << _WINNOW_PBITS) - 1


def _winnow_grams(data: bytes, k: int = WINNOW_K) -> np.ndarray:
    """All k-gram Karp-Rabin hashes of ``data`` (mod 2^61), vectorized:
    h_i = sum_j data[i+j] * 257^(k-1-j) — the position-decomposable form
    shared with ``rolling_fingerprints_sql``. Texts shorter than k hash
    whole (right-aligned power sum, same as the rolling short path)."""
    b = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    pows = np.array([pow(257, k - 1 - j, _WINNOW_MOD) for j in range(k)],
                    dtype=np.int64)
    if len(b) < k:
        if len(b) == 0:
            return np.array([0], dtype=np.int64)
        h = int((b * pows[k - len(b):] % _WINNOW_MOD).sum() % _WINNOW_MOD)
        return np.array([h], dtype=np.int64)
    n = len(b) - k + 1
    # windows x k gram matrix via stride view; python-int accumulate keeps
    # the mod-2^61 sums exact (k terms of < 2^61 each would overflow int64)
    win = np.lib.stride_tricks.sliding_window_view(b, k)
    acc = np.zeros(n, dtype=np.int64)
    for j in range(k):
        acc = (acc + win[:, j] * pows[j]) % _WINNOW_MOD
    return acc


def winnow_fingerprints(sf_dir: str):
    """Winnowing document fingerprints (the MOSS scheme, public algorithm:
    Schleimer/Wilkerson/Aiken 2003): per window of ``WINNOW_W`` consecutive
    k-gram hashes keep the minimum (rightmost wins ties), dedup the picks —
    a positional fingerprint set guaranteeing any shared substring of
    length >= k + W - 1 yields a shared fingerprint. The near-dup /
    plagiarism primitive that, unlike ``rolling_fingerprints`` (one global
    min per doc), supports partial-overlap detection.

    Doc-local and zero-shuffle: one vectorized map pass; ties and the
    window minimum are decided on the int64 composite
    ``(h mod 2^40) << 21 | (2^21-1-pos)`` so numpy and the SQL twin pick
    bit-identical fingerprints (positions bounded < 2^21 chars/doc).
    Returns DISTINCT (doc_id, pos, fp) rows, pos 1-based."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    w = WINNOW_W

    def fn(b: pa.Table) -> pa.Table:
        out_id, out_pos, out_fp = [], [], []
        for did, txt in zip(b.column("doc_id").to_pylist(),
                            b.column("text").to_pylist()):
            pos, fp = _winnow_picks(txt or "")
            out_id.extend([did] * len(pos))
            out_pos.extend(pos.tolist())
            out_fp.extend(fp.tolist())
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "pos": pa.array(out_pos, pa.int64()),
                         "fp": pa.array(out_fp, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")


def _winnow_picks(text: str, k: int = WINNOW_K,
                  w: int = WINNOW_W) -> tuple[np.ndarray, np.ndarray]:
    """Winnowing selection for one text: distinct (pos, fp) picks."""
    h = _winnow_grams(text.encode("utf-8"), k)
    h40 = h & ((1 << _WINNOW_HBITS) - 1)
    pos = np.arange(1, len(h) + 1, dtype=np.int64)
    comp = (h40 << _WINNOW_PBITS) | (_WINNOW_PMASK - pos)
    if len(comp) >= w:
        picks = np.unique(
            np.lib.stride_tricks.sliding_window_view(comp, w).min(axis=1))
    else:
        picks = np.array([comp.min()], dtype=np.int64)
    return _WINNOW_PMASK - (picks & _WINNOW_PMASK), picks >> _WINNOW_PBITS


def _winnow_sel_ctes(source: str, k: int = WINNOW_K,
                     w: int = WINNOW_W) -> str:
    """The winnowing CTE chain (power table -> k-gram hashes -> composites
    -> window mins -> distinct picks ``sel(doc_id, mc)``) over table/CTE
    ``source`` — shared by the fingerprint twin and the winnow-dup twin."""
    mod = _WINNOW_MOD
    pows = [pow(257, k - 1 - j, mod) for j in range(k)]
    ptable = ", ".join(f"({j}, {pows[j]}::HUGEINT)" for j in range(k))
    hmask = (1 << _WINNOW_HBITS) - 1
    return f"""p AS (SELECT * FROM (VALUES {ptable}) AS t(j, pw)),
d AS (SELECT doc_id, text, length(text) AS n FROM {source}),
kg_long AS (
  SELECT d.doc_id, s.i,
         (SUM((ord(substr(d.text, s.i + p.j, 1))::HUGEINT * p.pw) % {mod}))
           % {mod} AS h
  FROM d, unnest(generate_series(1, d.n - {k} + 1)) AS s(i), p
  WHERE d.n >= {k}
  GROUP BY d.doc_id, s.i),
kg_short AS (
  SELECT d.doc_id, 1 AS i,
         COALESCE((SUM((ord(substr(d.text, p.j - ({k} - d.n) + 1, 1))::HUGEINT
                        * p.pw) % {mod})) % {mod}, 0) AS h
  FROM d LEFT JOIN p ON p.j >= {k} - d.n
  WHERE d.n < {k}
  GROUP BY d.doc_id),
kg AS (SELECT * FROM kg_long UNION ALL SELECT * FROM kg_short),
comp AS (
  SELECT doc_id, i,
         ((CAST(h AS BIGINT) & {hmask}) << {_WINNOW_PBITS})
           | ({_WINNOW_PMASK} - i) AS c
  FROM kg),
win AS (
  SELECT doc_id,
         MIN(c) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS mc,
         COUNT(*) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS cnt
  FROM comp),
sel AS (
  SELECT DISTINCT doc_id, mc FROM win WHERE cnt = {w}
  UNION
  SELECT doc_id, MIN(c) AS mc FROM comp
  GROUP BY doc_id HAVING COUNT(*) < {w})"""


def winnow_fingerprints_sql() -> str:
    """DuckDB twin: the same k-gram power-sum hashes (HUGEINT-exact), the
    same 40-bit truncation and composite, a ROWS window MIN for full
    windows plus the global-min fallback for docs with < W grams."""
    return f"""
WITH {_winnow_sel_ctes('documents')}
SELECT doc_id,
       ({_WINNOW_PMASK} - (mc & {_WINNOW_PMASK}))::BIGINT AS pos,
       (mc >> {_WINNOW_PBITS})::BIGINT AS fp
FROM sel
"""


# ---------------------------------------------------------------------------
# winnowing near-dup pairs (rare shared fingerprints)
# ---------------------------------------------------------------------------

# df <= 6 because a doc divisible by BOTH dup mods carries base + exact +
# near copies (3 docs sharing most fingerprints) before any true
# cross-doc repetition — 4 missed doc 0's pair; C(6,2) pair fan-out per
# bucket is still O(1)
WINNOW_DUP_MAX_DF = 6
WINNOW_DUP_MIN_SHARED = 3  # report pairs sharing >= 3 rare fingerprints
# Pairing uses LONGER grams than the per-doc fingerprints: 8-char grams
# over this corpus's 31-token vocabulary collide corpus-wide (winnowing
# biases picks toward globally-low hash values, so popular gram VALUES
# dominate every doc's picks and fail the rare-df gate — measured 59/72
# exact-copy pairs found at k=8). 24 chars ≈ 4 tokens is distinctive.
WINNOW_DUP_K = 24


def winnow_dups(sf_dir: str, *, max_df: int = WINNOW_DUP_MAX_DF,
                min_shared: int = WINNOW_DUP_MIN_SHARED):
    """Substring-overlap near-dup pairs over the noisy corpus via shared
    winnowing fingerprints — the MOSS pairing step on top of
    :func:`winnow_fingerprints`. Only RARE fingerprints (document
    frequency 2..``max_df``) generate candidate pairs: a popular phrase's
    fingerprint carries no dedup signal and would blow the bucket up —
    the idf-style bound keeps every bucket's pair fan-out at
    C(max_df, 2) = O(1) rows, the same degenerate-bucket concern the
    minhash/simhash caps address, solved here by exclusion rather than
    capping (and mirrored exactly in the SQL twin's HAVING bound).

    Scale shape: one map pass emits per-doc DISTINCT fingerprints; ONE
    exchange on fp forms bucket pairs vectorized (per segment size s,
    each (i, j) combination is one array op — no per-bucket python); a
    second exchange on the pair key counts shared fingerprints and gates
    at ``min_shared``. Returns (a, b, n_shared)."""
    from ..util import hash_rollup

    docs = noisy_documents(sf_dir)

    def fp_rows(b: pa.Table) -> pa.Table:
        out_id, out_fp = [], []
        for did, txt in zip(b.column("doc_id").to_pylist(),
                            b.column("text").to_pylist()):
            _, fp = _winnow_picks(txt or "", k=WINNOW_DUP_K)
            u = np.unique(fp)
            out_id.extend([did] * len(u))
            out_fp.extend(u.tolist())
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "fp": pa.array(out_fp, pa.int64())})

    rows = docs.map_batches(fp_rows, batch_format="pyarrow")

    def bucket_pairs(t: pa.Table) -> pa.Table:
        fp = t.column("fp").to_numpy(zero_copy_only=False)
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((did, fp))
        fp, did = fp[order], did[order]
        starts = np.flatnonzero(np.r_[True, fp[1:] != fp[:-1]]) \
            if len(fp) else np.array([], dtype=np.int64)
        sizes = np.diff(np.r_[starts, len(fp)]) if len(fp) else starts
        out_a, out_b = [], []
        for s in range(2, max_df + 1):
            segs = starts[sizes == s]
            for i in range(s):
                for j in range(i + 1, s):
                    out_a.append(did[segs + i])  # did ascending in-segment
                    out_b.append(did[segs + j])
        if out_a:
            a = np.concatenate(out_a)
            bb = np.concatenate(out_b)
        else:
            a = bb = np.array([], dtype=np.int64)
        pt = pa.table({"a": pa.array(a, pa.int64()),
                       "b": pa.array(bb, pa.int64()),
                       "n_shared": pa.array(
                           np.ones(len(a), dtype=np.int64))})
        g = pa.TableGroupBy(pt, ["a", "b"]).aggregate([("n_shared", "sum")])
        return g.rename_columns(["a", "b", "n_shared"])

    pairs = hash_rollup(rows, ["fp"], bucket_pairs, batch_format="pyarrow")

    def count_shared(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["a", "b"]).aggregate([("n_shared", "sum")])
        g = g.rename_columns(["a", "b", "n_shared"])
        return g.filter(pc.greater_equal(g["n_shared"],
                                         pa.scalar(min_shared)))

    return hash_rollup(pairs, ["a", "b"], count_shared,
                       batch_format="pyarrow")


def winnow_dups_sql(max_df: int = WINNOW_DUP_MAX_DF,
                    min_shared: int = WINNOW_DUP_MIN_SHARED) -> str:
    return f"""
WITH noisy AS ({NOISY_DOCUMENTS_SQL}),
{_winnow_sel_ctes('noisy', k=WINNOW_DUP_K)},
fps AS (SELECT DISTINCT doc_id, (mc >> {_WINNOW_PBITS})::BIGINT AS fp
        FROM sel),
rare AS (SELECT fp FROM fps GROUP BY fp
         HAVING COUNT(*) BETWEEN 2 AND {max_df})
SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*)::BIGINT AS n_shared
FROM fps x
JOIN rare USING (fp)
JOIN fps y USING (fp)
WHERE x.doc_id < y.doc_id
GROUP BY x.doc_id, y.doc_id
HAVING COUNT(*) >= {min_shared}
"""


# ---------------------------------------------------------------------------
# count-min sketch + heavy hitters
# ---------------------------------------------------------------------------

CMS_D = 4            # sketch rows (independent hash functions)
CMS_W = 256          # sketch columns per row
HH_DENOM = 64        # heavy hitter = token with count >= total // HH_DENOM


def _cms_col(d: int, token: str) -> int:
    """Column of ``token`` in sketch row ``d``: first 8 md5 bytes of
    'd:token' mod W — replayed in DuckDB as
    ('0x' || substr(md5(...), 1, 16))::UBIGINT % W."""
    import hashlib

    h = hashlib.md5(f"{d}:{token}".encode("utf-8")).digest()[:8]
    return int.from_bytes(h, "big") % CMS_W


def countmin_registers(sf_dir: str):
    """Count-min sketch of token occurrences over the corpus — the
    mergeable frequency sketch (Cormode/Muthukrishnan 2005) companion to
    the HLL distinct sketch in ``stages/tiles``. Registers sum-merge, so
    the exchange is bounded at D x W cells regardless of corpus size: each
    block pre-reduces to its own (d, col, cnt) histogram and a single-task
    final sums them (``_merge_small``). Register STATE is hash-exact vs
    the SQL twin (same md5 column hash on both sides), the same
    driver-check pattern as ``hll_register_sketch``. Returns non-empty
    (d, col, cnt) rows."""
    import ray.data as rd

    from .relational import _merge_small

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        reg = np.zeros((CMS_D, CMS_W), dtype=np.int64)
        # per-block token histogram first: the md5 column hash is computed
        # once per DISTINCT token (bounded by vocabulary), not per
        # occurrence
        counts: dict[str, int] = {}
        for txt in b.column("text").to_pylist():
            for t in (txt or "").split(" "):
                if t:
                    counts[t] = counts.get(t, 0) + 1
        for tok, c in counts.items():
            for d in range(CMS_D):
                reg[d, _cms_col(d, tok)] += c
        d_idx, col_idx = np.nonzero(reg)
        return pa.table({"d": pa.array(d_idx.astype(np.int64)),
                         "col": pa.array(col_idx.astype(np.int64)),
                         "cnt": pa.array(reg[d_idx, col_idx])})

    def merge(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["d", "col"]).aggregate([("cnt", "sum")])
        return g.rename_columns(["d", "col", "cnt"])

    return _merge_small(docs.map_batches(partial, batch_format="pyarrow"),
                        merge)


def countmin_registers_sql() -> str:
    col = ("CAST(('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || tok), "
           f"1, 16))::UBIGINT % {CMS_W} AS BIGINT)")
    return f"""
WITH toks AS (
  SELECT tok
  FROM documents, UNNEST(list_filter(str_split(text, ' '), x -> x <> ''))
       AS t(tok)),
cells AS (
  SELECT d.d, {col} AS col
  FROM toks CROSS JOIN (SELECT UNNEST(range({CMS_D})) AS d) d)
SELECT d::BIGINT AS d, col, COUNT(*)::BIGINT AS cnt
FROM cells GROUP BY d, col
"""


def heavy_hitters(sf_dir: str):
    """Heavy hitters: tokens whose occurrence count >= total_tokens //
    HH_DENOM, found CMS-first — pass 1 builds the count-min registers and
    the total (bounded merges); pass 2 probes each block's DISTINCT tokens
    against the broadcast sketch (estimate = min over rows, an upper
    bound, so no true heavy hitter is pruned) and only CMS survivors enter
    the ONE exact-count exchange. At web scale the sketch prunes the tail
    vocabulary (the overwhelming majority) from the shuffle; the output is
    EXACT — (token, n) with the final filter on the true count — so the
    SQL twin is the plain GROUP BY/HAVING."""
    import ray

    import ray.data as rd

    from ..util import hash_rollup
    from .relational import _merge_small

    regs_t = countmin_registers(sf_dir).to_pandas()
    reg = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    reg[regs_t["d"].to_numpy(), regs_t["col"].to_numpy()] = \
        regs_t["cnt"].to_numpy()
    total = int(regs_t.loc[regs_t["d"] == 0, "cnt"].sum())
    threshold = max(total // HH_DENOM, 1)
    ref = ray.put(reg)

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def candidates(b: pa.Table) -> pa.Table:
        r = ray.get(ref) if not isinstance(ref, np.ndarray) else ref
        counts: dict[str, int] = {}
        for txt in b.column("text").to_pylist():
            for t in (txt or "").split(" "):
                if t:
                    counts[t] = counts.get(t, 0) + 1
        toks, ns = [], []
        for tok, c in counts.items():
            est = min(r[d, _cms_col(d, tok)] for d in range(CMS_D))
            if est >= threshold:
                toks.append(tok)
                ns.append(c)
        return pa.table({"token": pa.array(toks, pa.string()),
                         "n": pa.array(ns, pa.int64())})

    def merge(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["token"]).aggregate([("n", "sum")])
        return g.rename_columns(["token", "n"])

    exact = hash_rollup(docs.map_batches(candidates, batch_format="pyarrow"),
                        ["token"], merge, batch_format="pyarrow")

    def final(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["n"], pa.scalar(threshold)))

    return _merge_small(exact, final)


def heavy_hitters_sql() -> str:
    return f"""
WITH toks AS (
  SELECT tok
  FROM documents, UNNEST(list_filter(str_split(text, ' '), x -> x <> ''))
       AS t(tok)),
tot AS (SELECT COUNT(*)::BIGINT AS t FROM toks)
SELECT tok AS token, COUNT(*)::BIGINT AS n
FROM toks CROSS JOIN tot
GROUP BY tok, tot.t
HAVING COUNT(*) >= GREATEST(tot.t // {HH_DENOM}, 1)
"""


# ---------------------------------------------------------------------------
# URL revisit collapse (CDX-style crawl dedup by fetch recency)
# ---------------------------------------------------------------------------

REVISIT_MOD = 7       # doc_id % 7 == 0 -> url fetched twice
REVISIT_MOD2 = 21     # doc_id % 21 == 0 -> fetched three times
REVISIT_STEP_US = 3_600_000_000  # 1h between fetches


def url_revisits(sf_dir: str):
    """CDX-style revisit collapse: the crawl index pattern of keeping, per
    url, the LATEST fetch plus the fetch count. Revisit fetches are
    synthesized deterministically in-stream (docs with doc_id % 7 == 0
    refetch at +1h; % 21 == 0 again at +2h) from ONE read — the same
    single-read in-batch explode as ``noisy_documents``. One hash exchange
    on url over per-block (max ts, count) partials — both merge-
    associative, so blocks pre-reduce and the exchange ships one row per
    (url, block)."""
    import ray.data as rd

    from ..sources import synth
    from ..util import hash_rollup

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def explode(b: pa.Table) -> pa.Table:
        did = b.column("doc_id").to_numpy(zero_copy_only=False)
        ts0 = synth.derive_warc_ts(did)
        parts = [(did, ts0)]
        m2 = did % REVISIT_MOD == 0
        parts.append((did[m2], ts0[m2] + np.timedelta64(REVISIT_STEP_US, "us")))
        m3 = did % REVISIT_MOD2 == 0
        parts.append((did[m3],
                      ts0[m3] + np.timedelta64(2 * REVISIT_STEP_US, "us")))
        alld = np.concatenate([p[0] for p in parts])
        allt = np.concatenate([p[1] for p in parts])
        urls = synth.derive_url(alld)
        t = pa.table({"url": pa.array(urls, pa.string()),
                      "ts": pa.array(allt),
                      "n": pa.array(np.ones(len(alld), dtype=np.int64))})
        g = pa.TableGroupBy(t, ["url"]).aggregate(
            [("ts", "max"), ("n", "sum")])
        return g.rename_columns(["url", "latest_ts", "n_fetches"])

    def merge(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["url"]).aggregate(
            [("latest_ts", "max"), ("n_fetches", "sum")])
        return g.rename_columns(["url", "latest_ts", "n_fetches"])

    return hash_rollup(docs.map_batches(explode, batch_format="pyarrow"),
                       ["url"], merge, batch_format="pyarrow")


def url_revisits_sql() -> str:
    from ..sources import synth

    return f"""
WITH fetches AS (
  SELECT {synth.url_sql()} AS url, {synth.warc_ts_sql()} AS ts
  FROM documents
  UNION ALL
  SELECT {synth.url_sql()} AS url,
         {synth.warc_ts_sql()} + INTERVAL 1 HOUR AS ts
  FROM documents WHERE doc_id % {REVISIT_MOD} = 0
  UNION ALL
  SELECT {synth.url_sql()} AS url,
         {synth.warc_ts_sql()} + INTERVAL 2 HOUR AS ts
  FROM documents WHERE doc_id % {REVISIT_MOD2} = 0)
SELECT url, MAX(ts) AS latest_ts, COUNT(*)::BIGINT AS n_fetches
FROM fetches GROUP BY url
"""

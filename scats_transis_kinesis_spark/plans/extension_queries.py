"""North-star extension queries: dedup, similarity search, text
analysis, multimodal plumbing (BASELINE.json).

Oracle strategy: every stochastic-looking operator (minhash, simhash)
is actually a *deterministic* function of the portable md5-based hash
family (functions/hashing.py) with module-fixed seeds — so the DuckDB
oracle strings below are generated from the same parameters and match
bit-for-bit.  Only genuinely engine-specific sketches (IVF recall path)
fall back to the driver's rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import minhash_value_sql
from ..operators import dedup as D
from ..operators import multimodal as M
from ..operators import similarity as S
from ..operators import text as X
from ..sources.loaders import load_table
from .registry import register

# --- oracle SQL builders (mirror the Spark operators exactly) -------------

_H32 = "(('0x' || substr(md5({e}), 1, 8))::BIGINT)"
_H64 = "(('0x' || substr(md5({e}), 1, 15))::BIGINT)"


def _minhash_lsh_oracle() -> str:
    mins = ",\n               ".join(
        f"min({minhash_value_sql('h', a, b)}) AS m{i}"
        for i, (a, b) in enumerate(D.MINHASH_COEFFS)
    )
    band_rows = []
    for band in range(D.BANDS):
        cols = ", ".join(
            f"m{band * D.ROWS_PER_BAND + r}::VARCHAR" for r in range(D.ROWS_PER_BAND)
        )
        band_rows.append(
            f"SELECT doc_id, {band} AS band, "
            + _H64.format(e=f"concat_ws(',', {cols})")
            + " AS bucket FROM sig"
        )
    bands_sql = "\n            UNION ALL\n            ".join(band_rows)
    return f"""
        WITH sets AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       generate_series(1, len(w) - {D.SHINGLE_N - 1}),
                       i -> array_to_string(w[i:i+{D.SHINGLE_N - 1}], ' '))) AS toks
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
            WHERE len(w) >= {D.SHINGLE_N}
        ), tok AS (
            SELECT doc_id, unnest(toks) AS token FROM sets
        ), h AS (
            SELECT doc_id, {_H32.format(e='token')} AS h FROM tok
        ), sig AS (
            SELECT doc_id,
               {mins}
            FROM h GROUP BY doc_id
        ), banded AS (
            {bands_sql}
        ), cand AS (
            SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
            FROM banded l JOIN banded r
              ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
        )
        SELECT id_a, id_b, jaccard FROM (
            SELECT c.id_a, c.id_b,
                   round(len(list_intersect(a.toks, b.toks))::DOUBLE
                         / len(list_distinct(a.toks || b.toks)), 6) AS jaccard
            FROM cand c
            JOIN sets a ON a.doc_id = c.id_a
            JOIN sets b ON b.doc_id = c.id_b
        ) WHERE jaccard >= {D.JACCARD_THRESHOLD}
    """


def _simhash_oracle() -> str:
    bit_sums = ",\n               ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(D.SIMHASH_BITS)
    )
    recompose = " + ".join(
        f"CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(D.SIMHASH_BITS)
    )
    return f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
        ), h AS (
            SELECT doc_id, {_H32.format(e='token')} AS h FROM tok
        ), s AS (
            SELECT doc_id,
               {bit_sums}
            FROM h GROUP BY doc_id
        )
        SELECT doc_id, ({recompose})::BIGINT AS simhash FROM s
    """


_STOPLIST_SQL = ", ".join(f"'{w}'" for w in X.EN_STOPWORDS)


# --- dedup ----------------------------------------------------------------


@register(
    "dedup_exact",
    oracle=f"""
        SELECT {_H64.format(e='text')} AS content_hash,
               min(doc_id) AS keep_id,
               count(*) AS n_copies
        FROM documents GROUP BY 1
    """,
    doc="""Exact dedup via content-hash groupBy — shuffles (hash, id)
    pairs only, never payloads (operators/dedup.py:exact_dedup_groups).""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup_groups(load_table(spark, "documents", sf_dir))


@register(
    "dedup_minhash_lsh",
    oracle=_minhash_lsh_oracle(),
    doc="""MinHash(k=32) + LSH(8×4 bands) near-dup pairs with exact
    Jaccard verification ≥ 0.5 (operators/dedup.py).  The oracle
    replays the identical signature/banding math in DuckDB — the
    portable hash family makes the sketch engine-independent.""",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_lsh_near_dups(load_table(spark, "documents", sf_dir))


@register(
    "dedup_clusters_minhash",
    oracle=f"""
        WITH RECURSIVE pairs AS (
            SELECT id_a, id_b FROM ({_minhash_lsh_oracle()}) t
        ),
        edges AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION
            SELECT id_b AS src, id_a AS dst FROM pairs
        ),
        reach AS (
            SELECT src, dst FROM edges
            UNION
            SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON r.dst = e2.src
        )
        SELECT src AS member_id, least(src, min(dst)) AS cluster_id
        FROM reach GROUP BY src
    """,
    doc="""Dedup clustering over the TEXT near-dup pairs: connected
    components on the MinHash+LSH verified pairs — the minhash twin of
    dedup_clusters_embedding, so both pair generators feed the same
    iterative min-label propagation
    (operators/dedup.py:connected_components).  Oracle: the identical
    fixpoint as a recursive CTE over the replayed signature math.""",
)
def dedup_clusters_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import connected_components

    return connected_components(dedup_minhash_lsh(spark, sf_dir))


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
        WITH sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       generate_series(1, len(w) - 2),
                       i -> array_to_string(w[i:i+2], ' '))) AS s
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
            WHERE len(w) >= 3
        ), inv AS (
            SELECT doc_id, len(s) AS n_sh, unnest(s) AS sh FROM sh WHERE len(s) > 0
        ), ov AS (
            SELECT l.doc_id AS id_a, r.doc_id AS id_b,
                   any_value(l.n_sh) AS n_a, any_value(r.n_sh) AS n_b,
                   count(*) AS n_common
            FROM inv l JOIN inv r ON l.sh = r.sh AND l.doc_id < r.doc_id
            GROUP BY l.doc_id, r.doc_id
        )
        SELECT id_a, id_b, jaccard FROM (
            SELECT id_a, id_b,
                   round(n_common::DOUBLE / (n_a + n_b - n_common), 6) AS jaccard
            FROM ov
        ) WHERE jaccard >= 0.5
    """,
    doc="""Word-3-gram shingle Jaccard near-dup via inverted-index
    candidate join with PPJoin prefix + positional + length filters
    (lossless for Jaccard >= 0.5) — hot shingles never enter the index,
    never the O(n²) pair space (operators/dedup.py:ngram_jaccard_pairs).""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(load_table(spark, "documents", sf_dir), n=3, threshold=0.5)


@register(
    "dedup_simhash",
    oracle=_simhash_oracle(),
    doc="""24-bit SimHash per document — per-bit majority over token
    hashes in one grouped aggregation (operators/dedup.py:simhash).""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash(load_table(spark, "documents", sf_dir))


def _simhash_pairs_oracle() -> str:
    bpb = D.SIMHASH_BITS // D.SIMHASH_BANDS
    mask = (1 << bpb) - 1
    return f"""
        WITH sims AS ({_simhash_oracle()}),
        banded AS (
            SELECT doc_id, simhash, band,
                   (simhash >> (band * {bpb})) & {mask} AS chunk
            FROM sims CROSS JOIN (
                SELECT unnest(generate_series(0, {D.SIMHASH_BANDS - 1})) AS band)
        )
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               bit_count(xor(a.simhash, b.simhash)) AS hamming
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {D.SIMHASH_HAMMING_MAX}
    """


@register(
    "dedup_simhash_pairs",
    oracle=_simhash_pairs_oracle(),
    doc="""SimHash near-dup *pairs*: banded candidate join + exact
    Hamming verify (operators/dedup.py:simhash_near_dup_pairs).
    Pigeonhole over 4 disjoint 6-bit bands makes the candidate filter
    lossless for Hamming ≤ 3 — the join shuffles |docs|×4 tiny rows,
    never the O(n²) pair space.""",
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_near_dup_pairs(load_table(spark, "documents", sf_dir))


# --- similarity search ----------------------------------------------------

_SIM_QUERY_IDS = [0, 1, 2, 3, 4]


@register(
    "sim_topk_bruteforce",
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
            FROM embeddings WHERE vec_id IN ({", ".join(map(str, _SIM_QUERY_IDS))})
        ), pairs AS (
            SELECT q.qid AS query_id, c.vec_id AS neighbor_id,
                   round(
                     list_dot_product(q.qv, c.embedding::DOUBLE[])
                     / (sqrt(list_dot_product(q.qv, q.qv))
                        * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))),
                     6) AS cosine_sim
            FROM q JOIN embeddings c ON c.vec_id <> q.qid
        )
        SELECT query_id, neighbor_id, cosine_sim FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rn
            FROM pairs
        ) WHERE rn <= 5
    """,
    doc="""Exact top-5 cosine neighbors for 5 query vectors: broadcast
    nested-loop over one corpus scan; double-precision sequential dot
    products rounded to 6 digits match DuckDB bit-for-bit
    (operators/similarity.py:cosine_topk_bruteforce).""",
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.cosine_topk_bruteforce(
        load_table(spark, "embeddings", sf_dir), query_ids=_SIM_QUERY_IDS, k=5
    )


_COS = (
    "round(list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) "
    "* sqrt(list_dot_product({b}, {b}))), 6)"
)

@register(
    "sim_topk_ivf",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        cents AS (
            SELECT vec_id AS centroid_id, v AS cvec FROM e
            ORDER BY vec_id LIMIT 16
        ),
        assigned AS (
            SELECT vec_id, v, centroid_id FROM (
                SELECT e.vec_id, e.v, c.centroid_id,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {_COS.format(a="e.v", b="c.cvec")} DESC,
                                    c.centroid_id ASC) AS rn
                FROM e CROSS JOIN cents c
            ) WHERE rn = 1
        ),
        q AS (
            SELECT vec_id AS query_id, v AS qvec FROM e
            WHERE vec_id IN ({", ".join(map(str, _SIM_QUERY_IDS))})
        ),
        probe AS (
            SELECT query_id, qvec, centroid_id FROM (
                SELECT q.query_id, q.qvec, c.centroid_id,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY {_COS.format(a="q.qvec", b="c.cvec")} DESC,
                                    c.centroid_id ASC) AS rn
                FROM q CROSS JOIN cents c
            ) WHERE rn <= 4
        ),
        scored AS (
            SELECT p.query_id, a.vec_id AS neighbor_id,
                   {_COS.format(a="p.qvec", b="a.v")} AS cosine_sim
            FROM probe p JOIN assigned a USING (centroid_id)
            WHERE a.vec_id <> p.query_id
        )
        SELECT query_id, neighbor_id, cosine_sim FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY cosine_sim DESC, neighbor_id) AS rn
            FROM scored
        ) WHERE rn <= 5
    """,
    doc="""IVF-bucketed approximate top-k (scale path): corpus assigned
    to 16 coarse centroids (deterministic seed = lowest vec_ids),
    queries probe the 4 nearest clusters — scans nprobe/C of the data
    at 100 TB (operators/similarity.py:cosine_topk_bucketed).
    Approximate relative to the brute-force twin (recall measured in
    tests), but its own semantics are fully deterministic — the oracle
    replicates centroid seeding, rounded-cosine assignment with
    centroid-id tiebreaks, probing, and final top-k exactly.""",
)
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.cosine_topk_bucketed(
        load_table(spark, "embeddings", sf_dir),
        query_ids=_SIM_QUERY_IDS,
        k=5,
        num_centroids=16,
        nprobe=4,
    )


# --- text analysis --------------------------------------------------------


@register(
    "text_token_stats",
    oracle="""
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               length(text) AS n_chars_measured,
               round(list_sum(list_transform(string_split(text, ' '), t -> length(t)))::DOUBLE
                     / len(string_split(text, ' ')), 6) AS mean_token_len
        FROM documents
    """,
    doc="Tokenization stats (operators/text.py:token_stats).",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.token_stats(load_table(spark, "documents", sf_dir))


@register(
    "text_quality",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, text,
                   string_split(text, ' ') AS w,
                   len(list_filter(string_split(text, ' '),
                       t -> t IN ({_STOPLIST_SQL})))::DOUBLE
                       / len(string_split(text, ' ')) AS stop_r,
                   length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))::DOUBLE
                       / length(text) AS punct_r
            FROM documents
        )
        SELECT doc_id,
               len(w) AS n_tokens,
               round(stop_r, 6) AS stop_ratio,
               round(punct_r, 6) AS punct_ratio,
               round(0.4 * least(len(w) / 100.0, 1.0) + 0.3 * stop_r + 0.3 * (1 - punct_r), 6)
                   AS quality
        FROM t
    """,
    doc="Quality scoring: length/stopword/punctuation heuristic (operators/text.py:quality_score).",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.quality_score(load_table(spark, "documents", sf_dir))


@register(
    "text_lang_id",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   len(list_filter(string_split(text, ' '),
                       t -> t IN ({_STOPLIST_SQL})))::DOUBLE
                       / len(string_split(text, ' ')) AS r
            FROM documents
        )
        SELECT doc_id, round(r, 6) AS en_stop_ratio,
               CASE WHEN r > 0.05 THEN 'en' ELSE 'und' END AS lang_guess
        FROM t
    """,
    doc="Language-ID heuristic via stopword density (operators/text.py:lang_id).",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.lang_id(load_table(spark, "documents", sf_dir))


@register(
    "text_fingerprint",
    oracle=f"""
        SELECT doc_id,
               {_H64.format(e='text')} AS fp,
               {_H64.format(e=("trim(regexp_replace(regexp_replace(lower(text), "
                               "'[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"))} AS fp_norm
        FROM documents
    """,
    doc="Document fingerprints, raw + normalized (operators/text.py:fingerprint).",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.fingerprint(load_table(spark, "documents", sf_dir))


# --- multimodal -----------------------------------------------------------


@register(
    "multimodal_payload_stats",
    oracle="""
        SELECT doc_id AS media_id,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS payload_md5,
               'text/plain' AS mime
        FROM documents
    """,
    doc="""Multimodal binary-column plumbing: opaque payload + typed
    metadata, byte stats as pure column ops
    (operators/multimodal.py:payload_stats).  Decode itself is stubbed
    (no codecs in container) — plumbing exercised in unit tests via the
    deterministic fake extractor.""",
)
def multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.payload_stats(M.documents_as_media(load_table(spark, "documents", sf_dir)))

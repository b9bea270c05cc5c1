"""Round-5 batch: distributed linear algebra, ingest stitching, and
capacity-planning math — the numerical layer under embedding hygiene
and scan-acceleration design:

- ``pca_top_component`` — top principal component of the 64-dim
  embedding cloud by three fixed power-iteration rounds over the
  exact-integer covariance (the direction ``embedding_anisotropy_audit``
  measures against; the whitening/compression prep step).  Proof the
  engine does ITERATIVE linear algebra as table joins — the covariance
  is a 64×64 FRAME, never a driver-side matrix.
- ``doc_stitch_overlap`` — ingest-stitching detector: document pairs
  where one's trailing k tokens exactly equal another's leading k
  tokens (the signature of a splitter that broke one source document
  into two) — an equi-join on the boundary token window, the lossless
  complement to containment/minhash near-dup.
- ``bloom_filter_sizing`` — standard Bloom-filter capacity math
  (m = −n·ln p/ln²2, k = m/n·ln 2) evaluated per join-key column from
  its exact distinct count — the sizing sheet behind
  ``bloom_runtime_filter_audit``'s runtime filters.
- ``lsh_parameter_planner`` — the banded-minhash S-curve
  P(candidate) = 1 − (1 − s^r)^b across the engine's (bands, rows)
  design space with each configuration's similarity threshold
  (1/b)^(1/r) — the design table behind ``dedup_minhash_lsh``'s 4×8
  choice and the 8×4 recall variant noted in BACKLOG.

Determinism contracts: PCA quantizes embeddings to exact milli-ints
and the covariance to integer milli-units, so every power-iteration
matvec is an exact int64 dot product and renormalization is
sign·floor(|w|·1000/max|w|) — no float ever iterates; stitch joins
compare exact token strings; Bloom math is a fixed double expression
over exact distinct counts; the S-curve avoids ``pow`` entirely
(repeated squaring + sqrt chains, both correctly-rounded IEEE, so the
engines compute bit-identical doubles before the micros rounding).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loaders import load_table
from .pipeline_queries13 import _idiv
from .registry import register

# --- PCA top component -----------------------------------------------------

_PCA_ROUNDS = 3


def _pca_oracle() -> str:
    iters = []
    prev = "v0"
    for t in range(1, _PCA_ROUNDS + 1):
        iters.append(
            f"""w{t} AS (
            SELECT c.i, (sum(c.cv * {prev}.vv))::BIGINT AS wv
            FROM c JOIN {prev} ON c.j = {prev}.i GROUP BY c.i
        ), v{t} AS (
            SELECT w{t}.i,
                   (CASE WHEN w{t}.wv < 0 THEN -1 ELSE 1 END)
                   * (CASE WHEN mx.mx > 0
                           THEN ((abs(w{t}.wv) * 1000) // mx.mx)
                           ELSE 0 END) AS vv
            FROM w{t} CROSS JOIN
                 (SELECT max(abs(wv))::BIGINT AS mx FROM w{t}) mx
        )"""
        )
        prev = f"v{t}"
    return f"""
        WITH m AS (
            SELECT vec_id, round(x * 1000)::BIGINT AS v, i::BIGINT AS i
            FROM (
                SELECT vec_id, unnest(embedding)::DOUBLE AS x,
                       generate_subscripts(embedding, 1) AS i
                FROM embeddings
            )
        ), nn AS (SELECT count(*)::BIGINT AS n FROM embeddings),
        t AS (SELECT i, (sum(v))::BIGINT AS ti FROM m GROUP BY i),
        s AS (
            SELECT a.i AS i, b.i AS j, (sum(a.v * b.v))::BIGINT AS sij
            FROM m a JOIN m b ON a.vec_id = b.vec_id GROUP BY a.i, b.i
        ), c AS (
            SELECT s.i, s.j,
                   (round(1000 * ((s.sij::DOUBLE
                                   - ta.ti::DOUBLE * tb.ti / nn.n)
                                  / nn.n)))::BIGINT AS cv
            FROM s JOIN t ta ON s.i = ta.i JOIN t tb ON s.j = tb.i
            CROSS JOIN nn
        ), v0 AS (SELECT i, 1000::BIGINT AS vv FROM t),
        {", ".join(iters)},
        w_fin AS (
            SELECT c.i, (sum(c.cv * {prev}.vv))::BIGINT AS wv
            FROM c JOIN {prev} ON c.j = {prev}.i GROUP BY c.i
        ), num AS (
            SELECT (sum({prev}.vv * w_fin.wv))::BIGINT AS a
            FROM {prev} JOIN w_fin ON {prev}.i = w_fin.i
        ), den AS (SELECT (sum(vv * vv))::BIGINT AS dd FROM {prev}),
        tr AS (SELECT (sum(cv))::BIGINT AS tv FROM c WHERE i = j)
        SELECT {prev}.i AS dim, {prev}.vv AS loading_milli,
               (num.a // den.dd) AS lambda_milli,
               (((num.a // den.dd) * 1000000) // tr.tv) AS evr_micros
        FROM {prev}, num, den, tr
        ORDER BY dim
    """


@register(
    "pca_top_component",
    oracle=_pca_oracle(),
    doc=f"""Top principal component of the embedding cloud by
    {_PCA_ROUNDS} fixed power-iteration rounds: embeddings
    milli-quantize to exact ints, the centered covariance becomes a
    64×64 FRAME of integer milli-units (cv = round(1000·cov)), and
    each iteration is an exact int64 mat-vec (one equi-join + grouped
    sum) followed by max-norm renormalization
    sign(w)·⌊|w|·1000/max|w|⌋ — no float ever enters the loop, so
    cross-engine parity is structural.  Output: the 64 loadings in
    milli-units plus the Rayleigh-quotient eigenvalue (covariance
    milli-units) and its explained-variance share of the trace in
    micros.  Determinism: the only doubles are the one fixed-order
    centering expression per covariance cell; power-iteration sign is
    fixed by the all-ones start.  Scale shape: the Gram pass is ONE
    shuffle keyed by (i, j) with map-side partial aggregation (each
    executor emits ≤ 64² partials regardless of row count); the
    covariance frame localCheckpoints once (4 reuses), and every
    iteration joins 64-row frames against it — driver never holds a
    matrix.  At 100 TB the identical plan runs; the d×d frame only
    grows with EMBEDDING dimension, not rows.  (A mapInPandas
    per-batch outer-product would cut the explode fan-out constant;
    the shuffle volume is already the 64²-partial minimum.)""",
)
def pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    mv = emb.select(
        F.transform(
            "embedding",
            lambda e: F.round(e.cast("double") * 1000).cast("long"),
        ).alias("mv")
    )
    nn = emb.agg(F.count("*").alias("n"))
    # One narrow pass: row-local outer product via nested posexplode
    # (no self-join shuffle — the oracle's m⋈m on vec_id is row-local
    # here, so only the 64²-group partial aggregates ever move).
    mi = mv.select("mv", F.posexplode("mv").alias("pos", "vi")).select(
        "mv", (F.col("pos") + 1).alias("i"), "vi"
    )
    # Materialize the 64-row dimension-sums frame once: it feeds the
    # covariance twice (ta/tb broadcasts) and seeds v0, and without the
    # cut each reference re-ran the full explode+aggregate — the before
    # plan showed 64 parquet scans (guide §1.2 step 1).  3 scans after
    # (t's job, nn's count, the covariance job).
    t = mi.groupBy("i").agg(F.sum("vi").alias("ti")).localCheckpoint(eager=True)
    s = (
        mi.select("i", "vi", F.posexplode("mv").alias("pos2", "vj"))
        .groupBy("i", (F.col("pos2") + 1).alias("j"))
        .agg(F.sum(F.col("vi") * F.col("vj")).alias("sij"))
    )
    ta = F.broadcast(t.select(F.col("i").alias("ti_i"), F.col("ti").alias("ti_a")))
    tb = F.broadcast(t.select(F.col("i").alias("tj_i"), F.col("ti").alias("ti_b")))
    c = (
        s.join(ta, s.i == ta.ti_i)
        .join(tb, s.j == tb.tj_i)
        .crossJoin(F.broadcast(nn))
        .select(
            "i",
            "j",
            F.round(
                1000
                * (
                    (
                        F.col("sij").cast("double")
                        - F.col("ti_a").cast("double") * F.col("ti_b") / F.col("n")
                    )
                    / F.col("n")
                )
            )
            .cast("long")
            .alias("cv"),
        )
    ).localCheckpoint()  # 64x64 frame, reused by every iteration
    v = t.select("i", F.lit(1000).cast("long").alias("vv"))

    def matvec(vec: DataFrame) -> DataFrame:
        vj = vec.select(F.col("i").alias("j"), "vv")
        return (
            c.join(F.broadcast(vj), "j")
            .groupBy("i")
            .agg(F.sum(F.col("cv") * F.col("vv")).alias("wv"))
        )

    for _ in range(_PCA_ROUNDS):
        w = matvec(v)
        mx = w.agg(F.max(F.abs(F.col("wv"))).alias("mx"))
        v = w.crossJoin(F.broadcast(mx)).select(
            "i",
            (
                F.when(F.col("wv") < 0, -1).otherwise(1)
                * F.when(
                    F.col("mx") > 0,
                    _idiv(F.abs(F.col("wv")) * 1000, F.col("mx")),
                ).otherwise(F.lit(0))
            ).cast("long").alias("vv"),
        )
    # The converged 64-row vector is read four ways below (w_fin, num,
    # den, the final select) — cut its 3-round lineage once so the
    # iteration chain executes a single time instead of per reference.
    v = v.localCheckpoint(eager=True)
    w_fin = matvec(v)
    num = (
        v.join(w_fin, "i")
        .agg(F.sum(F.col("vv") * F.col("wv")).alias("a"))
    )
    den = v.agg(F.sum(F.col("vv") * F.col("vv")).alias("dd"))
    tr = c.where(F.col("i") == F.col("j")).agg(F.sum("cv").alias("tv"))
    lam = _idiv(F.col("a"), F.col("dd"))
    return (
        v.crossJoin(F.broadcast(num))
        .crossJoin(F.broadcast(den))
        .crossJoin(F.broadcast(tr))
        .select(
            F.col("i").alias("dim"),
            F.col("vv").alias("loading_milli"),
            lam.alias("lambda_milli"),
            _idiv(lam * 1_000_000, F.col("tv")).alias("evr_micros"),
        )
        .orderBy("dim")
    )


# --- document stitching ------------------------------------------------------

_STITCH_K = 3


@register(
    "doc_stitch_overlap",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents
        ), k AS (
            SELECT doc_id,
                   array_to_string(toks[1:{_STITCH_K}], ' ') AS head,
                   array_to_string(toks[-{_STITCH_K}:], ' ') AS tail
            FROM t WHERE len(toks) >= {_STITCH_K}
        )
        SELECT a.doc_id AS left_doc_id, b.doc_id AS right_doc_id,
               a.tail AS overlap_text
        FROM k a JOIN k b
          ON a.tail = b.head AND a.doc_id <> b.doc_id
        ORDER BY left_doc_id, right_doc_id
    """,
    doc=f"""Ingest-stitching detector: pairs of documents where the
    left one's trailing {_STITCH_K} tokens exactly equal the right
    one's leading {_STITCH_K} tokens — the signature of an upstream
    splitter that broke one source document in two (pagination, size
    caps, crawler truncation).  Near-dup passes miss these by design
    (the two halves share almost NO content); the boundary window is
    the only witness.  Determinism: exact token-string equality on an
    equi-join — no hashing, no threshold.  Scale shape: one projection
    to (head, tail) per document, one string-keyed hash equi-join; at
    100 TB the join key becomes the 60-bit portable hash of the window
    with the string equality kept as the in-join verify (same plan,
    smaller exchange).  Documents shorter than {_STITCH_K} tokens are
    excluded on both sides (no boundary window exists).""",
)
def doc_stitch_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    toks = F.split("text", " ")
    k = docs.where(F.size(toks) >= _STITCH_K).select(
        "doc_id",
        F.array_join(F.slice(toks, 1, _STITCH_K), " ").alias("head"),
        F.array_join(F.slice(toks, -_STITCH_K, _STITCH_K), " ").alias("tail"),
    )
    a, b = k.alias("a"), k.alias("b")
    return (
        a.join(
            b,
            (F.col("a.tail") == F.col("b.head"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("left_doc_id"),
            F.col("b.doc_id").alias("right_doc_id"),
            F.col("a.tail").alias("overlap_text"),
        )
        .orderBy("left_doc_id", "right_doc_id")
    )


# --- Bloom filter sizing -----------------------------------------------------

_BLOOM_FPPS: tuple[tuple[str, float], ...] = (("1pct", 0.01), ("0_1pct", 0.001))


@register(
    "bloom_filter_sizing",
    oracle=f"""
        WITH u AS (
            SELECT 'o_custkey' AS col_name,
                   count(DISTINCT o_custkey)::BIGINT AS ndv FROM orders
            UNION ALL
            SELECT 'l_partkey', count(DISTINCT l_partkey)::BIGINT
            FROM lineitem
            UNION ALL
            SELECT 'l_suppkey', count(DISTINCT l_suppkey)::BIGINT
            FROM lineitem
        ), f AS (
            SELECT * FROM (VALUES
                {", ".join(f"('{lbl}', {p})" for lbl, p in _BLOOM_FPPS)}
            ) t(fpp_label, p)
        ), z AS (
            SELECT col_name, fpp_label, ndv,
                   ceil(-(ndv * ln(p)) / (ln(2) * ln(2)))::BIGINT AS m_bits
            FROM u CROSS JOIN f
        )
        SELECT col_name, fpp_label, ndv, m_bits,
               round((m_bits::DOUBLE / ndv) * ln(2))::BIGINT AS k_hashes,
               ((m_bits * 1000) // ndv) AS bits_per_key_milli,
               (m_bits // 8192) AS kib
        FROM z
        ORDER BY col_name, fpp_label
    """,
    doc="""Bloom-filter sizing sheet for the engine's join-key columns:
    from each column's EXACT distinct count, the optimal bit-array size
    m = ⌈−n·ln p / ln²2⌉ and hash count k = round(m/n·ln 2) at 1% and
    0.1% target false-positive rates, with bits-per-key and KiB — the
    capacity math behind bloom_runtime_filter_audit's runtime filters
    and any semi-join pushdown design.  Determinism: distinct counts
    are exact integers; the sizing formula is one fixed double
    expression per row (ln/ceil are correctly-rounded on these
    magnitudes).  Scale shape: three distinct-count aggregates (each
    one keyed shuffle with partial aggregation) + a 2-row constant
    frame — the audit is 6 rows at any data scale.""",
)
def bloom_filter_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    u = (
        orders.agg(F.countDistinct("o_custkey").alias("ndv")).select(
            F.lit("o_custkey").alias("col_name"), "ndv"
        )
        .unionAll(
            li.agg(F.countDistinct("l_partkey").alias("ndv")).select(
                F.lit("l_partkey").alias("col_name"), "ndv"
            )
        )
        .unionAll(
            li.agg(F.countDistinct("l_suppkey").alias("ndv")).select(
                F.lit("l_suppkey").alias("col_name"), "ndv"
            )
        )
    )
    f = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(lbl).alias("fpp_label"), F.lit(p).alias("p")
                )
                for lbl, p in _BLOOM_FPPS
            ]
        )
    )
    z = u.select("col_name", "ndv", f.alias("f")).select(
        "col_name",
        F.col("f.fpp_label").alias("fpp_label"),
        "ndv",
        F.ceil(
            -(F.col("ndv") * F.log(F.col("f.p")))
            / (F.log(F.lit(2.0)) * F.log(F.lit(2.0)))
        ).alias("m_bits"),
    )
    return z.select(
        "col_name",
        "fpp_label",
        "ndv",
        "m_bits",
        F.round((F.col("m_bits").cast("double") / F.col("ndv")) * F.log(F.lit(2.0)))
        .cast("long")
        .alias("k_hashes"),
        _idiv(F.col("m_bits") * 1000, F.col("ndv")).alias("bits_per_key_milli"),
        _idiv(F.col("m_bits"), F.lit(8192)).alias("kib"),
    ).orderBy("col_name", "fpp_label")


# --- LSH S-curve planner -----------------------------------------------------

_LSH_COMBOS: tuple[tuple[int, int], ...] = ((4, 8), (8, 4), (16, 2), (16, 4))
_LSH_SIMS: tuple[int, ...] = tuple(range(20, 100, 10))  # centi-similarities


def _sq_chain_sql(base: str, e: int) -> str:
    """x^e for e a power of two, as a repeated-squaring expression —
    identical IEEE multiplications in both engines (no libm pow)."""
    expr = base
    while e > 1:
        expr = f"({expr} * {expr})"
        e //= 2
    return expr


def _sq_chain_col(base: Column, e: int) -> Column:
    expr = base
    while e > 1:
        expr = expr * expr
        e //= 2
    return expr


def _sqrt_chain_sql(base: str, r: int) -> str:
    expr = base
    while r > 1:
        expr = f"sqrt({expr})"
        r //= 2
    return expr


def _sqrt_chain_col(base: Column, r: int) -> Column:
    expr = base
    while r > 1:
        expr = F.sqrt(expr)
        r //= 2
    return expr


def _lsh_oracle() -> str:
    rows = []
    for bands, rpb in _LSH_COMBOS:
        thr = _sqrt_chain_sql(f"(1.0 / {bands})", rpb)
        for sc in _LSH_SIMS:
            s = f"(({sc})::DOUBLE / 100)"
            p = f"(1 - {_sq_chain_sql(f'(1 - {_sq_chain_sql(s, rpb)})', bands)})"
            rows.append(
                f"({bands}, {rpb}, {sc}, "
                f"round(1000000 * {p})::BIGINT, "
                f"round(1000000 * {thr})::BIGINT)"
            )
    return f"""
        SELECT * FROM (VALUES
            {", ".join(rows)}
        ) t(bands, rows_per_band, sim_centi,
            collide_prob_micros, threshold_micros)
        ORDER BY bands, rows_per_band, sim_centi
    """


@register(
    "lsh_parameter_planner",
    oracle=_lsh_oracle(),
    doc=f"""Banded-minhash design table: the S-curve
    P(candidate | jaccard = s) = 1 − (1 − s^r)^b over the engine's
    (bands, rows-per-band) design space {_LSH_COMBOS} at similarities
    {{0.2..0.9}}, with each configuration's threshold (1/b)^(1/r) —
    the table behind dedup_minhash_lsh's 4×8 precision-leaning choice
    and the 8×4 recall variant BACKLOG notes for cosine-0.8 corpora.
    Determinism: NO libm pow — s^r and (·)^b are repeated-squaring
    chains and the threshold root is a sqrt chain, all correctly
    rounded IEEE ops, so both engines produce bit-identical doubles
    before the micros rounding.  Scale shape: a constant
    {len(_LSH_COMBOS) * len(_LSH_SIMS)}-row frame — the planner costs
    nothing at any scale; it exists so the LSH configuration is an
    AUDITABLE table instead of a code comment.""",
)
def lsh_parameter_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    combos = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bands).cast("long").alias("bands"),
                        F.lit(rpb).cast("long").alias("rows_per_band"),
                    )
                    for bands, rpb in _LSH_COMBOS
                ]
            )
        ).alias("c")
    ).select("c.bands", "c.rows_per_band")
    sims = F.explode(
        F.array(*[F.lit(sc).cast("long") for sc in _LSH_SIMS])
    ).alias("sim_centi")
    rows = combos.select("bands", "rows_per_band", sims)
    # The squaring/sqrt chain depth depends on (bands, rows_per_band),
    # so each combo gets its own branch of one chained CASE.
    prob_col: Column | None = None
    thr_col: Column | None = None
    for bands, rpb in _LSH_COMBOS:
        cond = (F.col("bands") == bands) & (F.col("rows_per_band") == rpb)
        s = F.col("sim_centi").cast("double") / 100
        p = F.round(
            1_000_000 * (1 - _sq_chain_col(1 - _sq_chain_col(s, rpb), bands))
        ).cast("long")
        thr = F.round(
            1_000_000 * _sqrt_chain_col(F.lit(1.0) / bands, rpb)
        ).cast("long")
        prob_col = F.when(cond, p) if prob_col is None else prob_col.when(cond, p)
        thr_col = F.when(cond, thr) if thr_col is None else thr_col.when(cond, thr)
    return rows.select(
        "bands",
        "rows_per_band",
        "sim_centi",
        prob_col.alias("collide_prob_micros"),
        thr_col.alias("threshold_micros"),
    ).orderBy("bands", "rows_per_band", "sim_centi")

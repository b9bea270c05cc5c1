"""Training-data pipeline queries, round 2 batch 2: corpus-frequency
heavy hitters, canonical-document selection for near-dup clusters,
SCD2 history builds, deterministic sharding, and language-mixture
(curriculum) sampling.

Every query is a declarative plan with partitioned-only shuffles and an
exact DuckDB oracle.  The heavy-hitters query demonstrates the
two-pass candidate-prune pattern (bounded-state coarse counts, then an
exact recount of the candidate subset) that replaces unbounded
``groupBy(token)`` state at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash32
from ..sources.loaders import load_table
from .coverage_queries import _LSH_PAIRS_CTES, dedup_embedding_lsh
from .registry import register

# Heavy-hitters support threshold (absolute count) and coarse-pass
# bucket width.  65536 buckets bound the first pass's aggregation state
# regardless of vocabulary size; a bucket's count upper-bounds every
# token in it, so pruning buckets below the threshold cannot drop a
# true heavy hitter (count-min guarantee with a single counter row).
HH_THRESHOLD = 200
HH_BUCKETS = 1 << 16


@register(
    "heavy_hitters_twopass",
    oracle=f"""
        SELECT tok, count(*)::BIGINT AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS tok
              FROM documents)
        GROUP BY tok
        HAVING count(*) >= {HH_THRESHOLD}
    """,
    doc="""Corpus-frequency heavy hitters (vocabulary pruning / stopword
    discovery) via the scalable two-pass pattern: pass 1 aggregates
    token counts into 65536 hash buckets — bounded state, fully
    map-side combinable, one tiny shuffle — and keeps buckets whose
    total reaches the threshold (a superset of the true heavy hitters,
    since a bucket's count >= any member token's count).  Pass 2
    recounts exactly, restricted to candidate buckets via a broadcast
    semi-join, so the big groupBy state is only the candidate tokens.
    A naive ``groupBy(token)`` carries the full vocabulary through the
    shuffle; this carries 65536 counters plus the survivors.  The
    oracle is the exact HAVING query — the two-pass plan loses
    nothing.""",
)
def heavy_hitters_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    toks = toks.withColumn("bucket", portable_hash32("tok") % HH_BUCKETS)
    cand_buckets = (
        toks.groupBy("bucket")
        .count()
        .where(F.col("count") >= HH_THRESHOLD)
        .select("bucket")
    )
    return (
        toks.join(F.broadcast(cand_buckets), "bucket", "left_semi")
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= HH_THRESHOLD)
    )


@register(
    "dedup_cluster_canonical",
    oracle=f"""
        WITH RECURSIVE
        {_LSH_PAIRS_CTES},
        edges AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION
            SELECT id_b AS src, id_a AS dst FROM pairs
        ),
        reach AS (
            SELECT src, dst FROM edges
            UNION
            SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON r.dst = e2.src
        ),
        cc AS (
            SELECT src AS member_id, least(src, min(dst)) AS cluster_id
            FROM reach GROUP BY src
        ),
        ranked AS (
            SELECT cc.cluster_id,
                   d.doc_id,
                   d.n_chars,
                   count(*) OVER (PARTITION BY cc.cluster_id)::BIGINT
                       AS n_members,
                   row_number() OVER (PARTITION BY cc.cluster_id
                                      ORDER BY d.n_chars DESC, d.doc_id)
                       AS rn
            FROM cc JOIN documents d ON d.doc_id = cc.member_id
        )
        SELECT cluster_id,
               doc_id AS canonical_doc_id,
               n_chars AS canonical_chars,
               n_members
        FROM ranked WHERE rn = 1
    """,
    doc="""Canonical-representative selection — the "keep one" step that
    turns near-dup clusters into a deduplicated corpus: each connected
    component of the embedding-LSH near-dup graph elects the member
    with the most content (max n_chars, doc_id tiebreak).  Spark side:
    min-label-propagation connected components (one keyed shuffle per
    round), a join to documents on the member id, then windows
    PARTITIONED BY cluster_id — no global window, no driver-side data.
    The oracle recomputes the fixpoint with a recursive CTE and the
    same ranked election.  doc_id and vec_id share an id space in the
    testdata (TESTDATA.md).""",
)
def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import connected_components

    cc = connected_components(dedup_embedding_lsh(spark, sf_dir))
    docs = load_table(spark, "documents", sf_dir)
    joined = cc.join(docs, cc.member_id == docs.doc_id)
    w = Window.partitionBy("cluster_id")
    ranked = joined.select(
        "cluster_id",
        "doc_id",
        "n_chars",
        F.count("*").over(w).alias("n_members"),
        F.row_number()
        .over(w.orderBy(F.col("n_chars").desc(), "doc_id"))
        .alias("rn"),
    )
    return ranked.where(F.col("rn") == 1).select(
        "cluster_id",
        F.col("doc_id").alias("canonical_doc_id"),
        F.col("n_chars").alias("canonical_chars"),
        "n_members",
    )


@register(
    "scd2_customer_orders",
    oracle="""
        SELECT o_custkey,
               o_orderkey,
               o_totalprice,
               o_orderdate AS valid_from,
               lead(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey)
                   AS valid_to,
               (lead(o_orderkey) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey)
                   IS NULL)::BOOLEAN AS is_current
        FROM orders
    """,
    doc="""SCD2 (slowly-changing-dimension type 2) history build: each
    customer's order stream becomes validity intervals — valid_from =
    the order date, valid_to = the next order's date (NULL while
    current), is_current on the latest row.  The canonical lakehouse
    dimension-maintenance shape.  One window PARTITIONED BY o_custkey
    (orderkey tiebreak for same-day orders) — shuffles once on the
    dimension key, no global ordering, scales linearly with
    customers.""",
)
def scd2_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
        F.lead("o_orderkey").over(w).isNull().alias("is_current"),
    )


@register(
    "corpus_shard_assignment",
    oracle=f"""
        SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 64
                   AS shard_id,
               count(*)::BIGINT AS n_docs,
               sum(n_chars)::BIGINT AS total_chars
        FROM documents
        GROUP BY 1
    """,
    doc="""Deterministic corpus sharding for training-data layout: each
    document maps to one of 64 shards by portable hash of its id, and
    the query reports per-shard document and byte totals — the balance
    check run before writing a sharded dataset.  Membership depends
    only on doc_id, so shards are stable across runs, engines, and
    repartitionings (unlike round-robin or random assignment).  The
    hash is a scan-stage column expression; the aggregate is 64 groups
    with full map-side combine — effectively shuffle-free at any
    scale.""",
)
def corpus_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    shard = (portable_hash32(F.col("doc_id").cast("string")) % 64).alias(
        "shard_id"
    )
    return docs.groupBy(shard).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


# BPE merge-induction rounds (tokenizer training).  Symbol sequences
# ride as wrapped strings '<c1><c2>…': one leftmost-greedy string
# replace() IS the BPE merge step — identical semantics in Spark and
# DuckDB, no fold/accumulator machinery needed.
BPE_ROUNDS = 3


def _bpe_oracle() -> str:
    syms = "string_split(regexp_replace(seq, '^<|>$', '', 'g'), '><')"
    pair_cte = (
        "SELECT pr.l AS l, pr.r AS r, sum(freq)::BIGINT AS c FROM ("
        "  SELECT freq, unnest(list_transform("
        "    generate_series(1, len({syms}) - 1),"
        "    i -> struct_pack(l := {syms}[i], r := {syms}[i + 1]))) AS pr"
        "  FROM s{t} WHERE len({syms}) >= 2"
        ") GROUP BY pr.l, pr.r"
    )
    ctes = [
        """v AS (
            SELECT tok AS word, count(*)::BIGINT AS freq
            FROM (SELECT unnest(string_split(text, ' ')) AS tok
                  FROM documents)
            GROUP BY tok
        )""",
        """s0 AS (
            SELECT word, freq,
                   regexp_replace(word, '(.)', '<\\1>', 'g') AS seq
            FROM v
        )""",
    ]
    for t in range(BPE_ROUNDS):
        ctes.append(
            f"p{t} AS ({pair_cte.format(syms=syms, t=t)})"
        )
        ctes.append(
            f"b{t} AS (SELECT l, r, c FROM p{t} "
            f"ORDER BY c DESC, l, r LIMIT 1)"
        )
        if t + 1 < BPE_ROUNDS:
            ctes.append(
                f"""s{t + 1} AS (
                    SELECT word, freq,
                           replace(seq, '<' || b.l || '><' || b.r || '>',
                                   '<' || b.l || b.r || '>') AS seq
                    FROM s{t} CROSS JOIN b{t} b
                )"""
            )
    selects = [
        f"SELECT {t + 1} AS merge_round, l AS pair_left, r AS pair_right,"
        f" l || r AS merged, c AS pair_count FROM b{t}"
        for t in range(BPE_ROUNDS)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


@register(
    "bpe_merge_induction",
    oracle=_bpe_oracle(),
    doc="""Tokenizer training (BPE vocabulary induction): 3 merge
    rounds over the corpus vocabulary — count adjacent symbol pairs
    weighted by word frequency, merge the globally most frequent pair
    (count DESC, lexicographic tiebreak), repeat on the merged
    sequences.  Symbol sequences are wrapped strings ('<c1><c2>…') so
    the merge step is ONE leftmost-greedy ``replace`` — a narrow map
    over the distinct-word table, identical semantics in both engines.
    Per round the engine runs one keyed pair-count shuffle (map-side
    combine over the bounded vocabulary) and collects exactly one row
    (the winning pair) — the same driver footprint as the k-means
    centroid summary.  The oracle unrolls the rounds as chained
    CTEs.""",
)
def bpe_merge_induction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    state = vocab.select(
        "word",
        "freq",
        F.regexp_replace("word", "(.)", "<$1>").alias("seq"),
    )
    syms = F.split(F.regexp_replace("seq", "^<|>$", ""), "><")
    merges = []
    for t in range(BPE_ROUNDS):
        pairs = (
            state.where(F.size(syms) >= 2)
            .select(
                "freq",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.size(syms) - 2),
                        lambda i: F.struct(
                            syms[i].alias("l"), syms[i + 1].alias("r")
                        ),
                    )
                ).alias("pr"),
            )
            .groupBy("pr.l", "pr.r")
            .agg(F.sum("freq").alias("c"))
        )
        best = pairs.orderBy(
            F.col("c").desc(), "l", "r"
        ).first()
        merges.append((t + 1, best["l"], best["r"], int(best["c"])))
        state = state.withColumn(
            "seq",
            F.expr(
                "replace(seq, '<{l}><{r}>', '<{lr}>')".format(
                    l=best["l"], r=best["r"], lr=best["l"] + best["r"]
                )
            ),
        )
    return spark.createDataFrame(
        [(r, l, rr, l + rr, c) for r, l, rr, c in merges],
        "merge_round int, pair_left string, pair_right string,"
        " merged string, pair_count long",
    )


@register(
    "inverted_index_postings",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        vocab AS (
            SELECT tok FROM toks GROUP BY tok
            HAVING count(*) >= {HH_THRESHOLD}
        )
        SELECT t.tok,
               count(DISTINCT t.doc_id)::BIGINT AS doc_freq,
               array_to_string(array_agg(DISTINCT t.doc_id ORDER BY t.doc_id),
                               ',') AS postings
        FROM toks t JOIN vocab USING (tok)
        GROUP BY t.tok
    """,
    doc="""Inverted-index build (search/retrieval infra): sorted
    posting lists per term, restricted to the heavy-hitter vocabulary
    so no single posting array exceeds bounded size unpredictably —
    at 100 TB the full-vocabulary variant would shard postings by
    (term, doc_id range) instead of collecting one array per term
    (documented; the per-term grouped sort is the same plan).  One
    keyed shuffle on the term; dedup + ordering happen inside the
    aggregate.  Postings render as a comma-joined string so the output
    is scalar-only (driver canonicalizers can't hash list cells).""",
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    vocab = (
        toks.groupBy("tok").count().where(F.col("count") >= HH_THRESHOLD)
    ).select("tok")
    return (
        toks.join(F.broadcast(vocab), "tok", "left_semi")
        .groupBy("tok")
        .agg(
            F.countDistinct("doc_id").alias("doc_freq"),
            F.array_join(F.sort_array(F.collect_set("doc_id")), ",").alias(
                "postings"
            ),
        )
    )


@register(
    "collocation_pmi",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks,
                   len(string_split(text, ' ')) AS n
            FROM documents
        ),
        bigrams AS (
            SELECT unnest(list_transform(generate_series(1, n - 1),
                          i -> struct_pack(w1 := toks[i],
                                           w2 := toks[i + 1]))) AS bg
            FROM t WHERE n >= 2
        ),
        bg_counts AS (
            SELECT bg.w1 AS w1, bg.w2 AS w2, count(*)::DOUBLE AS c12
            FROM bigrams GROUP BY bg.w1, bg.w2
            HAVING count(*) >= 10
        ),
        uni AS (
            SELECT tok, count(*)::DOUBLE AS c
            FROM (SELECT unnest(string_split(text, ' ')) AS tok
                  FROM documents)
            GROUP BY tok
        ),
        tot AS (
            SELECT sum(c) AS n_uni,
                   (SELECT count(*)::DOUBLE FROM bigrams) AS n_bg
            FROM uni
        )
        SELECT b.w1, b.w2, b.c12::BIGINT AS pair_count,
               round(ln((b.c12 / tot.n_bg)
                        / ((u1.c / tot.n_uni) * (u2.c / tot.n_uni))), 6)
                   AS pmi
        FROM bg_counts b
        JOIN uni u1 ON u1.tok = b.w1
        JOIN uni u2 ON u2.tok = b.w2
        CROSS JOIN tot
        ORDER BY pmi DESC, w1, w2
        LIMIT 20
    """,
    doc="""Collocation mining (phrase discovery for tokenizer /
    vocabulary curation): pointwise mutual information of adjacent
    token pairs vs their unigram marginals, top-20 with deterministic
    tiebreak.  Bigram extraction is a pure array expression (zero
    shuffle); pair and unigram counts are keyed aggregates; marginals
    attach via broadcast joins of the (bounded, HAVING-pruned) pair
    table against the unigram counts; the global top-k is
    TakeOrdered — no global sort materialized.""",
)
def collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    t = docs.select(F.split("text", " ").alias("toks")).withColumn(
        "n", F.size("toks")
    )
    bigrams = t.where(F.col("n") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.col("n") - 2),
                lambda i: F.struct(
                    F.col("toks")[i].alias("w1"),
                    F.col("toks")[i + 1].alias("w2"),
                ),
            )
        ).alias("bg")
    )
    # Pinned bigram tally (change-8 waist): the PMI join reads the
    # frequent pairs and the total-instance count reads the SAME tally
    # (n_bg = Σ counts — exactly the old bigrams.count()), so the
    # bigram window explode runs once instead of twice.  Same for the
    # unigram table: n_uni and both join sides read one pinned frame
    # instead of re-exploding the token stream three times.
    bg_all = (
        bigrams.groupBy("bg.w1", "bg.w2")
        .agg(F.count("*").cast("double").alias("c12"))
        .localCheckpoint(eager=True)
    )
    bg_counts = bg_all.where(F.col("c12") >= 10)
    uni = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("double").alias("c"))
        .localCheckpoint(eager=True)
    )
    n_uni = uni.agg(F.sum("c").alias("n_uni"))
    n_bg = bg_all.agg(F.sum("c12").alias("n_bg"))
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    return (
        bg_counts.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bg))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("pair_count"),
            F.round(
                F.log(
                    (F.col("c12") / F.col("n_bg"))
                    / (
                        (F.col("c1") / F.col("n_uni"))
                        * (F.col("c2") / F.col("n_uni"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(20)
    )


@register(
    "dq_constraint_audit",
    oracle="""
        SELECT 'orders_null_custkey' AS check_name,
               count(*) FILTER (WHERE o_custkey IS NULL)::BIGINT
                   AS violations
        FROM orders
        UNION ALL
        SELECT 'orders_dup_orderkey',
               (count(*) - count(DISTINCT o_orderkey))::BIGINT
        FROM orders
        UNION ALL
        SELECT 'orders_dangling_custkey',
               count(*)::BIGINT
        FROM orders o
        WHERE NOT EXISTS (
            SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        UNION ALL
        SELECT 'lineitem_nonpositive_qty',
               count(*) FILTER (WHERE l_quantity <= 0)::BIGINT
        FROM lineitem
    """,
    doc="""Data-quality constraint audit (expectation checks): NOT NULL,
    primary-key uniqueness, referential integrity (orders→customer via
    LEFT ANTI join), and a domain predicate — the validation pass a
    pipeline runs before publishing a dataset.  Null/domain checks are
    scan-stage conditional counts (map-side combine to one row);
    uniqueness is count vs distinct-count on the key (partial aggs);
    the FK check is one keyed join against the dimension.  Each check
    emits (check_name, violations) so the whole audit is a single
    4-row frame a scheduler can assert on.""",
)
def dq_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)

    null_ck = orders.agg(
        F.lit("orders_null_custkey").alias("check_name"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("violations"),
    )
    dup_pk = orders.agg(
        F.lit("orders_dup_orderkey").alias("check_name"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("violations"),
    )
    dangling = (
        orders.join(
            customer, orders.o_custkey == customer.c_custkey, "left_anti"
        ).agg(
            F.lit("orders_dangling_custkey").alias("check_name"),
            F.count("*").alias("violations"),
        )
    )
    domain = lineitem.agg(
        F.lit("lineitem_nonpositive_qty").alias("check_name"),
        F.count(F.when(F.col("l_quantity") <= 0, 1)).alias("violations"),
    )
    return null_ck.unionByName(dup_pk).unionByName(dangling).unionByName(
        domain
    )


@register(
    "domain_shift_kl",
    oracle=f"""
        WITH toks AS (
            SELECT lang, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        vocab AS (
            SELECT tok FROM toks GROUP BY tok
            HAVING count(*) >= {HH_THRESHOLD}
        ),
        vt AS (
            SELECT lang, toks.tok FROM toks
            JOIN vocab ON toks.tok = vocab.tok
        ),
        lang_tok AS (
            SELECT lang, tok, count(*)::DOUBLE AS c
            FROM vt GROUP BY lang, tok
        ),
        lang_tot AS (
            SELECT lang, sum(c) AS lt FROM lang_tok GROUP BY lang
        ),
        glob_tok AS (
            SELECT tok, sum(c) AS g FROM lang_tok GROUP BY tok
        ),
        glob_tot AS (SELECT sum(c) AS gt FROM lang_tok)
        SELECT l.lang,
               lang_tot.lt::BIGINT AS n_tokens,
               round(sum((l.c / lang_tot.lt)
                         * ln((l.c / lang_tot.lt)
                              / (glob_tok.g / glob_tot.gt))), 6) AS kl
        FROM lang_tok l
        JOIN lang_tot USING (lang)
        JOIN glob_tok USING (tok)
        CROSS JOIN glob_tot
        GROUP BY l.lang, lang_tot.lt
    """,
    doc="""Domain-shift detection (information-theoretic corpus stats):
    KL divergence of each language slice's unigram distribution from
    the corpus distribution, restricted to the heavy-hitter vocabulary
    so the distribution support is bounded and dense.  The vocabulary
    is a broadcast semi-join (same two-pass economics as
    heavy_hitters_twopass); the distributions are keyed aggregates on
    (lang, tok); the final KL is a per-lang sum of ~|vocab| terms.
    The standard screen for "does this source/shard look like the
    corpus" before mixing new data into a training run.""",
)
def domain_shift_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    vocab = (
        toks.groupBy("tok").count().where(F.col("count") >= HH_THRESHOLD)
    ).select("tok")
    vt = toks.join(F.broadcast(vocab), "tok", "left_semi")
    lang_tok = vt.groupBy("lang", "tok").agg(
        F.count("*").cast("double").alias("c")
    )
    lang_tot = lang_tok.groupBy("lang").agg(F.sum("c").alias("lt"))
    glob_tok = lang_tok.groupBy("tok").agg(F.sum("c").alias("g"))
    glob_tot = lang_tok.agg(F.sum("c").alias("gt"))
    p = F.col("c") / F.col("lt")
    q = F.col("g") / F.col("gt")
    return (
        lang_tok.join(F.broadcast(lang_tot), "lang")
        .join(F.broadcast(glob_tok), "tok")
        .crossJoin(F.broadcast(glob_tot))
        .groupBy("lang", "lt")
        .agg(F.round(F.sum(p * F.log(p / q)), 6).alias("kl"))
        .select(
            "lang", F.col("lt").cast("long").alias("n_tokens"), "kl"
        )
    )


# k-means contract parameters (operators/ml.py): cluster count,
# assignment rounds, embedding dimensionality.
KM_K, KM_ITERS, KM_DIM = 8, 3, 64


def _kmeans_ctes(
    k: int = KM_K,
    iters: int = KM_ITERS,
    dim: int = KM_DIM,
    final_update: bool = False,
    prefix: str = "",
    source: str = "embeddings",
) -> tuple[list[str], str]:
    """Exactly-unrolled Lloyd iterations as chained CTEs: assignment
    d{t}/a{t}/s{t}, centroid update c{t+1} — every FP intermediate
    rounded to 6 in lockstep with the Spark loop.  Returns the CTE
    list and the name of the final-assignment CTE (vec_id, v, cid,
    dist) so downstream oracles (semantic dedup) can extend the same
    chain.  Parameterized since round 10 so the trained-IVF quantizer
    oracle can unroll its own (k, iters); the defaults keep this
    query's oracle byte-identical.  ``final_update=True`` appends one
    more centroid-update CTE ``c{iters}`` computed FROM the final
    assignment (the trained-centroid export, unused by the assignment
    contract itself) and returns its name instead.

    ``prefix``/``source`` (round 10, stability audit): a non-empty
    prefix renames every CTE ``{prefix}e``/``{prefix}c0``/... so TWO
    independent Lloyd chains can coexist in one oracle, and ``source``
    is the FROM clause of the corpus CTE (e.g. ``embeddings WHERE
    vec_id % 2 = 0`` trains on a deterministic half).  With the
    defaults the emitted SQL is byte-identical to the pre-parameter
    form — pinned by sha256 in tests/test_round10b_anchors.py."""
    p = prefix
    dist = (
        f"round(list_reduce(list_transform(generate_series(1, {dim}),"
        " i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i])),"
        " (x, y) -> x + y), 6)"
    )
    mean_list = ", ".join(f"round(avg(v[{i + 1}]), 6)" for i in range(dim))
    # The assignment CTE references alias ``e``; a prefixed chain keeps
    # that alias (``FROM {p}e e``) so the dist expression is shared.
    e_ref = f"{p}e e" if p else "e"
    ctes = [
        f"{p}e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM {source})",
        f"""{p}c0 AS (
            SELECT (row_number() OVER (ORDER BY vec_id) - 1)::INT AS cid,
                   v AS c
            FROM {p}e ORDER BY vec_id LIMIT {k}
        )""",
    ]
    for t in range(iters):
        ctes.append(
            f"""{p}d{t} AS (
                SELECT e.vec_id, e.v, c.cid, {dist} AS dist
                FROM {e_ref} CROSS JOIN {p}c{t} c
            )"""
        )
        ctes.append(
            f"""{p}a{t} AS (
                SELECT vec_id, v, cid, dist,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY dist, cid) AS rn
                FROM {p}d{t}
            )"""
        )
        ctes.append(
            f"{p}s{t} AS (SELECT vec_id, v, cid, dist FROM {p}a{t} WHERE rn = 1)"
        )
        if t + 1 < iters or final_update:
            ctes.append(
                f"""{p}c{t + 1} AS (
                    SELECT cid, [{mean_list}] AS c
                    FROM {p}s{t} GROUP BY cid
                )"""
            )
    return ctes, (f"{p}c{iters}" if final_update else f"{p}s{iters - 1}")


def _kmeans_oracle() -> str:
    ctes, last = _kmeans_ctes()
    return (
        "WITH " + ",\n".join(ctes) + f"""
        SELECT vec_id, cid AS cluster, dist FROM {last}
    """
    )


@register(
    "kmeans_embedding_clusters",
    oracle=_kmeans_oracle(),
    doc="""Iterative ML loop (Lloyd's k-means) over the embedding
    corpus: 3 assignment rounds, centroids updated between rounds,
    deterministic smallest-id init.  Per iteration the engine runs one
    broadcast-join scan (k·dim centroid scalars) and one grouped
    per-dimension mean; the driver sees only the k·dim centroid
    summary — the canonical Spark training-loop shape, same contract
    trick as approx_distinct: every FP intermediate (distance,
    centroid coordinate) is rounded to 6 on BOTH engines with
    identical fold order, so the iterations cannot diverge and the
    final assignment hash-matches an exactly-unrolled recursive-CTE
    oracle.""",
)
def kmeans_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ml import kmeans_assign

    e = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return kmeans_assign(e, k=KM_K, iters=KM_ITERS, dim=KM_DIM)


# Incremental-maintenance split point: rows before this date play the
# "yesterday's materialized state" role; rows on/after it are the delta.
INCR_SPLIT = "1999-01-01"


@register(
    "incremental_agg_maintenance",
    oracle="""
        SELECT o_orderstatus,
               count(*)::BIGINT AS n_orders,
               round(sum(o_totalprice::DECIMAL(18,2))::DOUBLE, 2)
                   AS total_price
        FROM orders
        GROUP BY o_orderstatus
    """,
    doc="""Incremental aggregate maintenance (materialized-view refresh
    shape): yesterday's aggregate state (orders before the split date,
    pre-aggregated) merges with today's delta's partial aggregate by
    UNION + re-reduce — counts and sums are algebraic, so the merge
    touches |groups| + |delta| rows and never rescans the base data.
    At 100 TB this is the difference between a daily full recompute
    and a delta-sized refresh.  Sums go through DECIMAL(18,2) so the
    two-level aggregation tree is bit-exact against the oracle's
    single-level full recompute (FP addition order would differ).""",
)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    price = F.col("o_totalprice").cast("decimal(18,2)")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count("*").alias("n_orders"),
            F.sum(price).alias("total_price"),
        )

    base_state = partial(orders.where(F.col("o_orderdate") < INCR_SPLIT))
    delta = partial(orders.where(F.col("o_orderdate") >= INCR_SPLIT))
    return (
        base_state.unionByName(delta)
        .groupBy("o_orderstatus")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("total_price").alias("total_price"),
        )
        .select(
            "o_orderstatus",
            F.col("n_orders").cast("long").alias("n_orders"),
            F.round(F.col("total_price").cast("double"), 2).alias(
                "total_price"
            ),
        )
    )


# Target language mixture for curriculum sampling (weights sum to 1).
MIXTURE_WEIGHTS = {"en": 0.30, "zh": 0.20, "es": 0.20, "de": 0.15, "fr": 0.15}


@register(
    "curriculum_mixture_sample",
    oracle=f"""
        WITH counts AS (
            SELECT lang, count(*)::BIGINT AS total_docs
            FROM documents GROUP BY lang
        ),
        w(lang, wt) AS (
            VALUES {", ".join(f"('{k}', {v}::DOUBLE)" for k, v in MIXTURE_WEIGHTS.items())}
        ),
        j AS (
            SELECT counts.lang, total_docs, wt
            FROM counts JOIN w ON counts.lang = w.lang
        ),
        cap AS (SELECT min(total_docs / wt) AS n FROM j),
        rates AS (
            SELECT lang, total_docs, wt * n / total_docs AS rate
            FROM j CROSS JOIN cap
        ),
        kept AS (
            SELECT d.lang, count(*)::BIGINT AS kept_docs
            FROM documents d JOIN rates r ON d.lang = r.lang
            WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT
                      % 1000000 < r.rate * 1000000
            GROUP BY d.lang
        )
        SELECT r.lang,
               r.total_docs,
               coalesce(k.kept_docs, 0)::BIGINT AS kept_docs,
               round(r.rate, 6) AS keep_rate
        FROM rates r LEFT JOIN kept k ON r.lang = k.lang
    """,
    doc="""Language-mixture (curriculum) sampling: given target corpus
    weights per language, compute the largest sample that achieves the
    mixture exactly (capped by the most-constrained language), derive a
    per-language keep rate, and select documents deterministically by
    portable hash — so the sampled corpus is reproducible across
    engines and layouts.  The per-language stats are a 5-row aggregate
    broadcast back onto the scan; document selection is a scan-stage
    predicate (hash-bucket < rate), no shuffle of document data at
    all.  The same shape handles source/domain mixing at 100 TB: the
    rate table stays tiny regardless of corpus size.""",
)
def curriculum_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    weights = spark.createDataFrame(
        list(MIXTURE_WEIGHTS.items()), "lang string, wt double"
    )
    counts = docs.groupBy("lang").agg(F.count("*").alias("total_docs"))
    # Pinned ≤|langs|-row stats frame (change-8 waist): the cap
    # aggregate and the rate table both read it, and the rate table is
    # itself read twice (keep-filter join + final report) — without the
    # cut each reference re-derived the per-language corpus count scan.
    j = counts.join(weights, "lang").localCheckpoint(eager=True)
    cap = j.agg(F.min(F.col("total_docs") / F.col("wt")).alias("n"))
    rates = j.crossJoin(F.broadcast(cap)).select(
        "lang",
        "total_docs",
        (F.col("wt") * F.col("n") / F.col("total_docs")).alias("rate"),
    )
    bucket = portable_hash32(F.col("doc_id").cast("string")) % 1000000
    kept = (
        docs.join(F.broadcast(rates), "lang")
        .where(bucket < F.col("rate") * 1000000)
        .groupBy("lang")
        .agg(F.count("*").alias("kept_docs"))
    )
    return (
        rates.join(kept, "lang", "left")
        .select(
            "lang",
            "total_docs",
            F.coalesce("kept_docs", F.lit(0)).alias("kept_docs"),
            F.round("rate", 6).alias("keep_rate"),
        )
    )

"""Additional reference-parity and SQL-surface queries.

Covers the remaining SURVEY.md §2 operator shapes on the driver's real
tables (the SCATS-shaped micro-fixtures exercise the same operators in
unit tests): F1/F3 unnest joins, F4 double unnest, S3 XML parse (as a
roundtrip so the oracle needs no XML support), grouping sets, exact
quantiles, string/array scalar surfaces, bag-semantics set ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loaders import load_table
from .registry import register


@register(
    "f3_unnest_words",
    oracle="""
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents
    """,
    doc="""F1/F3 — correlated unnest with the parent key on every child
    row (reference: transis_response_models.py:175-198): explode runs
    in-partition, no shuffle, no join.""",
)
def f3_unnest_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))


@register(
    "f4_double_unnest",
    oracle="""
        WITH words AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents WHERE doc_id < 50
        )
        SELECT doc_id, word, unnest(string_split(word, '')) AS ch
        FROM words
    """,
    doc="""F4 — two nesting levels unnested (reference:
    transis_response_models.py:194-197): site × phases × SGNos becomes
    doc × words × chars; chained explodes, still shuffle-free.""",
)
def f4_double_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).where(F.col("doc_id") < 50)
    return (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .select("doc_id", "word", F.explode(F.split("word", "")).alias("ch"))
    )


@register(
    "s3_xml_roundtrip",
    oracle="SELECT doc_id, lang AS xml_lang, source AS xml_source FROM documents",
    doc="""S3 — XML document parse (reference:
    transis_response_models.py:288-292) inside the correctness gate:
    rows are rendered to XML attributes and parsed back with the same
    ``from_xml`` path the Transis ingestion uses; the oracle is the
    identity projection.""",
)
def s3_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    xml = F.concat(
        F.lit('<doc lang="'), F.col("lang"), F.lit('" source="'), F.col("source"), F.lit('"/>')
    )
    parsed = docs.select(
        "doc_id", F.from_xml(xml, "struct<_lang:string, _source:string>").alias("r")
    )
    return parsed.select(
        "doc_id",
        F.col("r._lang").alias("xml_lang"),
        F.col("r._source").alias("xml_source"),
    )


@register(
    "grouping_sets_orders",
    oracle="""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="Explicit GROUPING SETS (not derivable from cube/rollup shape).",
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "quantiles_exact",
    oracle="""
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.9), 6) AS p90,
               round(quantile_cont(value, 0.99), 6) AS p99
        FROM events GROUP BY event_type
    """,
    doc="""Exact continuous-interpolation quantiles (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``).  The approximate twin
    (percentile_approx / HLL-style sketch) is engine-specific and
    covered rows-only by approx_distinct.""",
)
def quantiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


@register(
    "string_functions",
    oracle="""
        SELECT doc_id,
               upper(substr(text, 1, 10)) AS head_upper,
               length(text) AS len,
               replace(substr(text, 1, 30), ' ', '_') AS snake,
               CASE WHEN text LIKE '%spark%' THEN 1 ELSE 0 END AS mentions_spark,
               strpos(text, 'data') AS data_pos
        FROM documents
    """,
    doc="String scalar surface: upper/substr/replace/like/instr.",
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.upper(F.substring("text", 1, 10)).alias("head_upper"),
        F.length("text").alias("len"),
        F.regexp_replace(F.substring("text", 1, 30), " ", "_").alias("snake"),
        F.when(F.col("text").like("%spark%"), 1).otherwise(0).alias("mentions_spark"),
        F.instr(F.col("text"), "data").alias("data_pos"),
    )


@register(
    "array_functions",
    oracle="""
        SELECT doc_id,
               len(list_distinct(string_split(text, ' '))) AS n_distinct_words,
               string_split(text, ' ')[1] AS first_word,
               string_split(text, ' ')[-1] AS last_word,
               list_sort(list_distinct(string_split(text, ' ')))[1] AS min_word,
               array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], '|')
                   AS first3_sorted
        FROM documents
    """,
    doc="Array/collection scalar surface: distinct/sort/index/slice/join.",
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    words = F.split("text", " ")
    sorted_distinct = F.array_sort(F.array_distinct(words))
    return docs.select(
        "doc_id",
        F.size(F.array_distinct(words)).alias("n_distinct_words"),
        F.element_at(words, 1).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
        F.element_at(sorted_distinct, 1).alias("min_word"),
        F.array_join(F.slice(sorted_distinct, 1, 3), "|").alias("first3_sorted"),
    )


@register(
    "hof_array_surface",
    oracle="""
        WITH base AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        SELECT doc_id,
               len(w)::BIGINT AS n_words,
               list_sum(list_transform(w, x -> length(x)))::BIGINT
                   AS total_chars,
               len(list_filter(w, x -> length(x) > 4))::BIGINT
                   AS n_long_words,
               CAST(list_contains(w, 'spark') AS INT) AS has_spark,
               CAST(len(list_filter(w, x -> length(x) >= 20)) = 0 AS INT)
                   AS all_short,
               array_to_string(
                   list_transform(generate_series(1, least(3, len(w))),
                                  i -> w[i] || ':' || i), ',')
                   AS first3_indexed
        FROM base
    """,
    doc="""Higher-order-function surface: transform (word→length map
    inside the array), aggregate (per-row sum over the transformed
    array), filter (+ size), exists (membership), forall (bounded
    length), and zip_with against a generated index sequence — the
    lambda-expression family Catalyst evaluates per-row WITHOUT
    exploding (no shuffle, no row multiplication; the whole query is
    one codegen'd projection over the scan).  Booleans cast to INT for
    cross-engine canon.""",
)
def hof_array_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    w = F.split("text", " ")
    lengths = F.transform(w, lambda x: F.length(x))
    indexed = F.zip_with(
        w,
        F.sequence(F.lit(1), F.size(w)),
        lambda x, i: F.concat(x, F.lit(":"), i.cast("string")),
    )
    return docs.select(
        "doc_id",
        F.size(w).cast("long").alias("n_words"),
        F.aggregate(
            lengths, F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("total_chars"),
        F.size(F.filter(w, lambda x: F.length(x) > 4))
        .cast("long")
        .alias("n_long_words"),
        F.exists(w, lambda x: x == "spark").cast("int").alias("has_spark"),
        F.forall(w, lambda x: F.length(x) < 20).cast("int").alias("all_short"),
        F.array_join(F.slice(indexed, 1, 3), ",").alias("first3_indexed"),
    )


@register(
    "setops_bag_semantics",
    oracle="""
        SELECT user_id, count(*) AS n FROM (
            SELECT user_id FROM events WHERE event_type IN ('click', 'view')
            UNION ALL
            SELECT user_id FROM events WHERE event_type = 'purchase'
        ) GROUP BY user_id
    """,
    doc="UNION ALL (bag semantics) + grouped count.",
)
def setops_bag_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    a = ev.where(F.col("event_type").isin("click", "view")).select("user_id")
    b = ev.where(F.col("event_type") == "purchase").select("user_id")
    return a.unionAll(b).groupBy("user_id").agg(F.count("*").alias("n"))

"""Round-5 batch (closing): storage-encoding economics.

- ``dictionary_encoding_audit`` — per-column dictionary/entropy-coding
  economics of the lineitem columns a layout designer would
  dictionary-encode: exact distinct counts, the Shannon entropy of the
  value distribution (the information-theoretic floor for any
  entropy coder, Shannon '48), the plain dictionary width
  ⌈log₂ ndv⌉, and their ratio — together with
  ``rle_compression_audit`` (run behavior under sort order) this is
  the fact base for choosing parquet encodings per column.

Determinism: ONE scan stacks the audited columns into (column, value)
pairs; value frequencies are exact counts; each value's entropy term
(c/n)·log₂(n/c) quantizes to integer MICRO-BITS before the per-column
sum (no double accumulation across an unbounded value domain); the
dictionary width is pure integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loaders import load_table
from .pipeline_queries13 import _idiv
from .registry import register

_DICT_COLS: tuple[str, ...] = (
    "l_quantity",
    "l_discount",
    "l_returnflag",
    "l_linestatus",
)


@register(
    "dictionary_encoding_audit",
    oracle=f"""
        WITH pairs AS (
            {" UNION ALL ".join(
                f"SELECT '{c}' AS col_name, {c}::VARCHAR AS val FROM lineitem"
                for c in _DICT_COLS
            )}
        ), freq AS (
            SELECT col_name, val, count(*)::BIGINT AS c
            FROM pairs GROUP BY col_name, val
        ), tot AS (
            SELECT col_name, (sum(c))::BIGINT AS n FROM freq
            GROUP BY col_name
        ), ent AS (
            SELECT f.col_name, any_value(t.n) AS n,
                   count(*)::BIGINT AS ndv,
                   (sum(round(1000000 * (f.c::DOUBLE / t.n)
                              * log2(t.n::DOUBLE / f.c))))::BIGINT
                       AS entropy_micro_bits
            FROM freq f JOIN tot t ON f.col_name = t.col_name
            GROUP BY f.col_name
        )
        SELECT col_name, n AS n_values, ndv,
               entropy_micro_bits,
               greatest(ceil(log2(ndv::DOUBLE))::BIGINT, 1) AS dict_bits,
               ((entropy_micro_bits)
                // greatest(ceil(log2(ndv::DOUBLE))::BIGINT, 1))
                   AS entropy_vs_dict_micros
        FROM ent
        ORDER BY col_name
    """,
    doc=f"""Dictionary/entropy-coding economics for {len(_DICT_COLS)}
    lineitem columns: exact ndv, the Shannon entropy of the value
    distribution in micro-bits (the floor for ANY entropy coder — what
    parquet's RLE_DICTIONARY + page compression approaches), the plain
    dictionary width ⌈log₂ ndv⌉, and entropy/dict-width (≪1e6 means a
    skewed distribution where entropy coding beats fixed-width
    dictionary codes).  The distribution-side companion to
    rle_compression_audit's sort-order view; the two together pick
    per-column parquet encodings.  Determinism: one stacked scan,
    exact counts, per-VALUE micro-bit quantization of the entropy term
    before the per-column sum, integer dictionary widths.  Scale
    shape: one (column, value)-keyed grouped count with map-side
    partial aggregation (the stack multiplies rows by
    |audited columns|, bounded by configuration), then |columns|-row
    arithmetic.""",
)
def dictionary_encoding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    stack_args = ", ".join(
        f"'{c}', cast(`{c}` as string)" for c in _DICT_COLS
    )
    pairs = li.select(
        F.expr(f"stack({len(_DICT_COLS)}, {stack_args}) AS (col_name, val)")
    )
    freq = pairs.groupBy("col_name", "val").agg(F.count("*").alias("c"))
    tot = freq.groupBy("col_name").agg(F.sum("c").alias("n"))
    ent = (
        freq.join(F.broadcast(tot), "col_name")
        .groupBy("col_name")
        .agg(
            F.first("n").alias("n"),
            F.count("*").alias("ndv"),
            F.sum(
                F.round(
                    1_000_000
                    * (F.col("c").cast("double") / F.col("n"))
                    * F.log2(F.col("n").cast("double") / F.col("c"))
                ).cast("long")
            ).alias("entropy_micro_bits"),
        )
    )
    dict_bits = F.greatest(
        F.ceil(F.log2(F.col("ndv").cast("double"))).cast("long"), F.lit(1)
    )
    return ent.select(
        "col_name",
        F.col("n").alias("n_values"),
        "ndv",
        "entropy_micro_bits",
        dict_bits.alias("dict_bits"),
        _idiv(F.col("entropy_micro_bits"), dict_bits).alias(
            "entropy_vs_dict_micros"
        ),
    ).orderBy("col_name")

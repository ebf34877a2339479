"""Broadcast Bloom filters as plan literals: membership tests with NO
join, for "is this value in the (small) reference set" predicates
over 100 TB fact sides.

The at-scale shape: the reference set (benchmark n-grams, a blocklist,
a seen-ids ledger) is orders of magnitude smaller than the corpus.
A broadcast LEFT SEMI join already avoids the shuffle, but it still
materializes and hashes the full reference relation per executor and
keeps a join node in the plan. A Bloom filter collapses the reference
set to m bits that ride the PLAN as one ``array<bigint>`` literal:
membership is k md5-derived bit probes — pure whole-stage-codegen
expression, usable inside higher-order lambdas (per-element over a
document's shingle array), with the classic guarantee: false
positives at the chosen rate, false negatives never.

The bit/hash arithmetic is byte-identical to the table-format bloom
index (sources/deltalog/): positions are
``conv(substr(md5('bloom<i>:' || value), 1, 15), 16, 10) % bits``,
so the same filter can be built by either side and probed by the
other. Sizing is the standard m = −n·ln p ∕ ln²2, k = (m/n)·ln 2.

Spark's own ``bloom_filter_agg`` exists JVM-side but is not exposed
as a composable expression for per-element lambda probes; this
module's filter is, and its bits are engine-portable (the DuckDB
oracle of any query using it could replay the same md5 arithmetic).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_size(n_items: int, fpp: float = 1e-4) -> tuple[int, int]:
    """(bits, hashes) for ``n_items`` keys at the target
    false-positive rate — bits rounded up to a multiple of 64 (whole
    words), hashes ≥ 1."""
    n = max(1, n_items)
    m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _positions(value: Column, bits: int, hashes: int) -> list[Column]:
    """The k bloom bit positions of a value expression — the SAME
    md5 arithmetic as deltalog's file-level bloom index."""
    return [
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"bloom{i}:"), value.cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % bits
        for i in range(hashes)
    ]


def bloom_build(
    df: DataFrame,
    column: str,
    bits: int | None = None,
    hashes: int | None = None,
    fpp: float = 1e-4,
) -> tuple[list[int], int, int]:
    """Build the filter over ``df[column]``'s distinct non-null values
    (the SMALL side): one distributed pass computes the distinct bit
    positions (≤ bits rows collected — the filter's own size, the
    driver traffic any broadcast structure costs), packed into
    ``bits/64`` signed-long words. Returns ``(words, bits, hashes)``."""
    vals = df.select(F.col(column).alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    if bits is None or hashes is None:
        n = vals.distinct().count()
        auto_bits, auto_hashes = bloom_size(n, fpp)
        bits = bits or auto_bits
        hashes = hashes or auto_hashes
    rows = (
        vals.select(
            F.explode(F.array(*_positions(F.col("_v"), bits, hashes))).alias(
                "p"
            )
        )
        .distinct()
        .collect()
    )
    words = [0] * (bits // 64)
    for r in rows:
        p = r["p"]
        words[p // 64] |= 1 << (p % 64)
    # array<bigint> literals are SIGNED longs: wrap to two's complement
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    return words, bits, hashes


def bloom_member(
    value: Column, words: list[int], bits: int, hashes: int
) -> Column:
    """Boolean membership expression: k bit probes against the words
    literal — ``element_at`` word lookup + dynamic ``shiftleft`` mask,
    all whole-stage codegen, legal inside higher-order lambdas. True
    may be a false positive (rate set at build); False is definitive."""
    arr = F.lit(words).cast("array<bigint>")
    probe = F.lit(True)
    for p in _positions(value, bits, hashes):
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("bigint"), (p % 64).cast("int")
        )
        probe = probe & (word.bitwiseAND(mask) != 0)
    return probe


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    fpp: float = 1e-4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination with a ZERO-JOIN corpus side: the
    benchmark's distinct n-grams build a Bloom filter (small side —
    one pass, filter-sized driver traffic), and every corpus document
    counts its distinct n-grams' membership with a per-element lambda
    probe — a pure map-side projection, no shuffle, no join node, no
    reference relation per executor. Same output contract as the
    semi-join formulation (``ext_decontamination``): per doc,
    ``n_shingles``, ``n_contaminated``, ``contamination_ratio``, and
    the ≥ ``threshold`` flag.

    Guarantees: every truly-contaminated n-gram IS counted (no false
    negatives), so no contaminated document can slip through;
    ``n_contaminated`` may overcount by the false-positive rate,
    which only errs toward dropping more — the safe direction for
    decontamination. At 100 TB this is the shape that matters: the
    corpus pass is embarrassingly parallel and the benchmark never
    leaves the driver as anything bigger than its bitset."""
    from ..functions import text as T

    bench_sh = (
        benchmark.select(
            F.explode(
                F.array_distinct(T.shingles(F.col(text_col), n))
            ).alias("s")
        )
        .distinct()
    )
    words, bits, hashes = bloom_build(bench_sh, "s", fpp=fpp)
    sh = F.array_distinct(T.shingles(F.col(text_col), n))
    return (
        corpus.select(
            F.col(id_col),
            sh.alias("_sh"),
        )
        .filter(F.size("_sh") > 0)
        .select(
            id_col,
            F.size("_sh").alias("n_shingles"),
            F.size(
                F.filter(
                    F.col("_sh"),
                    lambda s: bloom_member(s, words, bits, hashes),
                )
            ).alias("n_contaminated"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_contaminated",
            (
                F.col("n_contaminated").cast("double")
                / F.col("n_shingles")
            ).alias("contamination_ratio"),
            (
                F.col("n_contaminated").cast("double")
                / F.col("n_shingles")
                >= threshold
            ).alias("is_contaminated"),
        )
    )

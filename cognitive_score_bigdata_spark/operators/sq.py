"""Int8 scalar quantization (SQ8) for embedding columns — the
memory-tier compression every large-scale vector store runs (FAISS
``SQ8`` / Milvus ``IVF_SQ8`` shape): each dimension's float32 value is
coded into one byte against the corpus-wide per-dimension [min, max]
range, a 4× reduction over float32 (8× over float64) that turns a
scan-bound 100 TB rescoring pass into a quarter of the IO, at a
reconstruction error bounded by span/255 per dimension.

Everything here is deterministic, closed-form arithmetic — fit is a
per-dimension min/max aggregate, encode is ``floor((x - mn) * 255 /
span)`` clipped to [0, 255], decode is the bucket midpoint ``mn +
(code + 0.5) * span / 255`` — so unlike k-means/PQ codebooks the whole
pipeline is SQL-expressible and earns a full DuckDB hash oracle
(``queries/round16_staging.py``): codes are bit-identical cross-engine
(integer floor of an identical IEEE double expression tree), and the
asymmetric cosine ranking is margin-pinned like every other ANN row.

All three stages stay JVM-side (posexplode aggregate + HOF
transform/aggregate expressions inside whole-stage codegen — no Python
worker anywhere); the quantization range rides as array literals, the
same broadcast-a-tiny-build-artifact contract as the IVF centroid
matrix. Production note: at 100 TB the codes column would be packed
``binary`` (one byte per dim) rather than ``array<int>``; the int array
keeps the artifact SQL-joinable for the oracle while costing nothing
at test scale — the plumbing (fit → encode artifact → asymmetric
probe) is the part that transfers.

Reference parity: ANN-family extension over the reference's corpus
analytics surface (SURVEY §2-extras; the reference has no embedding
pipeline).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def sq8_fit(
    vectors: DataFrame, vec_col: str = "embedding"
) -> tuple[list[float], list[float]]:
    """Per-dimension ``(mins, maxes)`` over the corpus — the whole
    trained state of a scalar quantizer (dim doubles each; a bounded
    driver artifact like the IVF centroid matrix). One posexplode
    aggregate pass, map-side combined by Catalyst."""
    rows = (
        vectors.select(F.posexplode(F.col(vec_col)).alias("i", "x"))
        .groupBy("i")
        .agg(
            F.min(F.col("x").cast("double")).alias("mn"),
            F.max(F.col("x").cast("double")).alias("mx"),
        )
        .collect()
    )
    rows.sort(key=lambda r: r.i)
    mins = [float(r.mn) for r in rows]
    maxes = [float(r.mx) for r in rows]
    _check_spans(mins, maxes)
    return mins, maxes


def _check_spans(mins: list[float], maxes: list[float]) -> None:
    """A dimension with span <= 0 (constant column, or swapped bounds)
    would divide by zero in encode and flow NaN/Inf-derived garbage
    codes downstream silently — fail fast instead."""
    bad = [i for i, (mn, mx) in enumerate(zip(mins, maxes)) if not mx > mn]
    if bad:
        raise ValueError(
            f"SQ8: degenerate dimension span (mx <= mn) at dims {bad[:8]}"
            f"{'...' if len(bad) > 8 else ''} — constant dimensions must be "
            "dropped or jittered before quantization"
        )


def _lit_arr(vals: list[float]):
    return F.array(*[F.lit(float(v)) for v in vals])


def sq8_encode(
    vectors: DataFrame,
    mins: list[float],
    maxes: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(id, codes array<int>)`` — one byte-range code per dimension:
    ``floor((x - mn) * 255 / (mx - mn))`` clipped to [0, 255] (the max
    value itself lands in the top bucket via the clip). Pure HOF
    expression against the broadcast range literals; the codes are
    bit-identical in any IEEE-double engine evaluating the same
    expression tree, which is what makes the SQ8 pipeline
    hash-checkable end to end. Degenerate dimensions (mx <= mn) raise
    up front — they would divide by zero per element."""
    _check_spans(mins, maxes)
    mn_c, mx_c = _lit_arr(mins), _lit_arr(maxes)
    codes = F.transform(
        F.col(vec_col),
        lambda x, i: F.least(
            F.lit(255),
            F.greatest(
                F.lit(0),
                F.floor(
                    (x.cast("double") - F.element_at(mn_c, i + 1))
                    * F.lit(255.0)
                    / (F.element_at(mx_c, i + 1) - F.element_at(mn_c, i + 1))
                ).cast("int"),
            ),
        ),
    )
    return vectors.select(
        F.col(id_col).alias("neighbor_id"), codes.alias("codes")
    )


def sq8_topk(
    codes: DataFrame,
    queries: DataFrame,
    mins: list[float],
    maxes: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric top-k over the code table: the float query scores
    every vector by cosine against its RECONSTRUCTION (bucket midpoint
    ``mn + (code + 0.5) * span / 255``) — the SQ rescoring tier's scan,
    where only codes are read and the float corpus never loads. Exact
    brute force over the compressed representation (no candidate
    pruning — compose with IVF for that); ties broken by id, so the
    ranking is deterministic up to the margin the tests pin."""
    mn_c, mx_c = _lit_arr(mins), _lit_arr(maxes)
    recon = F.transform(
        F.col("codes"),
        lambda c, i: F.element_at(mn_c, i + 1)
        + (c.cast("double") + F.lit(0.5))
        * (F.element_at(mx_c, i + 1) - F.element_at(mn_c, i + 1))
        / F.lit(255.0),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__q"),
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    scored = (
        F.broadcast(q)
        .crossJoin(codes.withColumn("__r", recon).drop("codes"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos",
            dot(F.col("__q"), F.col("__r"))
            / (
                F.sqrt(dot(F.col("__q"), F.col("__q")))
                * F.sqrt(dot(F.col("__r"), F.col("__r")))
            ),
        )
        .select("query_id", "neighbor_id", "cos")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", "cos")
    )

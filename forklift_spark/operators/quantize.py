"""Int8 embedding quantization — the scan-byte lever for ANN at 100 TB.

A float32 embedding column costs 4 bytes/component to store and to SCAN;
at corpus scale the candidate-verification read (and the brute-force
baseline) is bandwidth-bound, so symmetric int8 quantization is the
standard 4x lever: per vector, scale = max(|x|)/127 and q_i =
floor(x_i/scale + 0.5) stored as array<tinyint>, cosine computed from
INTEGER dot products rescaled by the two scales. Recall cost is small at
64-512 dims (measured in tests/test_quantize.py, >=0.9 recall@10 on the
fixtures) because cosine ranking only needs relative component
precision.

Engine-portability is a design rule here like everywhere in this repo:
the quantization arithmetic is floor-based (floor(x/scale + 0.5), never
round()) because floor over IEEE doubles is bit-deterministic across
engines while round() half-case conventions differ — the DuckDB oracle
in harness/q_textdata.py replays the identical expression and must
produce the identical int8 arrays (full value-hash parity).

All expressions are higher-order functions over the array columns —
zero UDFs, zero exchanges for the quantization itself (one scalar
projection, exactly like simindex's signatures); the let-binding trick
(transform over a single-element array) binds the per-vector scale once
instead of recomputing the max per component.

Zero-vector edge: scale 0 would divide by zero; `when(amax = 0)` emits
the all-zero int8 vector with scale 0, and quantized cosine against it
is NULL (undefined), matching float cosine's NULL for zero-norm inputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: scale expression: max(|x|)/127 over the (double-cast) components
_SCALE = "aggregate({v}, CAST(0.0 AS DOUBLE), (m, x) -> greatest(m, abs(CAST(x AS DOUBLE)))) / 127.0"


def quantize_sql(vec_col: str) -> str:
    """struct(scale: double, q: array<tinyint>) — floor-based symmetric
    int8 quantization, bit-deterministic across engines (see module
    docstring). The scale is let-bound once per vector."""
    return (
        f"transform(array({_SCALE.format(v=vec_col)}), s -> named_struct("
        f"'scale', s, "
        f"'q', CASE WHEN s = 0.0 THEN transform({vec_col}, x -> CAST(0 AS TINYINT)) "
        f"ELSE transform({vec_col}, x -> CAST(floor(CAST(x AS DOUBLE) / s + 0.5) AS TINYINT)) END"
        f"))[0]"
    )


def dequantize_sql(qstruct_col: str) -> str:
    """array<double> reconstruction: q_i * scale. Max per-component error
    is scale/2 by construction (asserted in tests)."""
    return (
        f"transform({qstruct_col}.q, v -> CAST(v AS DOUBLE) * {qstruct_col}.scale)"
    )


def quantized_cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine from two quantized structs: integer dot / integer norms —
    the scales cancel out of the ratio entirely, so this is pure int
    arithmetic until the final division (no float drift accumulation).
    NULL when either side is the zero vector, matching float cosine."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b

    def _idot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("long") * q.cast("long")),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    num = _idot(a["q"], b["q"]).cast("double")
    den = F.sqrt(_idot(a["q"], a["q"]).cast("double")) * F.sqrt(
        _idot(b["q"], b["q"]).cast("double")
    )
    return F.when(den != 0, num / den)


def quantize(df: DataFrame, vec_col: str, out_col: str = "qvec") -> DataFrame:
    """Add the quantized struct column (keep or drop the float column at
    the call site — dropping it is the 4x storage/scan win)."""
    return df.withColumn(out_col, F.expr(quantize_sql(vec_col)))


def brute_force_topk_q8(
    df: DataFrame,
    qvec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """Exact top-k by QUANTIZED cosine — the bandwidth-lean baseline: the
    scan reads 1 byte/component instead of 4, the ranking is integer
    arithmetic, and the plan is the same scan + TakeOrdered as the float
    baseline (ann_cosine_topk)."""
    amax = max(abs(float(v)) for v in query_vec) or 1.0
    scale = amax / 127.0
    q = [int((float(v) / scale + 0.5) // 1) for v in query_vec]
    qcol = F.struct(
        F.lit(scale).alias("scale"),
        F.array(*[F.lit(v).cast("tinyint") for v in q]).alias("q"),
    )
    scored = df.select(
        F.col(id_col), quantized_cosine(F.col(qvec_col), qcol).alias("qcos")
    )
    return (
        scored.orderBy(F.desc("qcos"), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("qcos", 4).alias("qcos"))
    )

"""Layout advisor (operators/zorder.py:layout_advisor): the three-row
report must equal a literal Python replay of the metric (quantize → key →
equal-code segment → bbox rollup), and the known layout trades must show
up — single-sort minimal on its own dimension and unpruned on the other,
Hilbert ahead of Morton on bbox area at a non-power-of-4 segment count."""

import numpy as np

from datapipelines_spark.operators.zorder import (
    _HILBERT_NXT,
    _HILBERT_OUT,
    layout_advisor,
)


def _morton_py(qa, qb, bits):
    out = 0
    for i in range(bits):
        out |= ((qa >> i) & 1) << (2 * i)
        out |= ((qb >> i) & 1) << (2 * i + 1)
    return out


def _hilbert_py(qa, qb, bits):
    st, d = 0, 0
    for i in range(bits - 1, -1, -1):
        q = ((qa >> i) & 1) * 2 + ((qb >> i) & 1)
        idx = st * 4 + q
        d = d * 4 + _HILBERT_OUT[idx]
        st = _HILBERT_NXT[idx]
    return d


def _advisor_py(points, bits, n_segments):
    """Literal replay: points are already quantized (full-range ints)."""
    amin, amax = min(p[0] for p in points), max(p[0] for p in points)
    bmin, bmax = min(p[1] for p in points), max(p[1] for p in points)

    def quant(v, lo, hi):
        return (v - lo) * (1 << bits) // (hi - lo + 1)

    keyed = {}
    for a, b in points:
        qa, qb = quant(a, amin, amax), quant(b, bmin, bmax)
        for layout, key, dbits in (
            ("sort_a", qa, bits),
            ("morton", _morton_py(qa, qb, bits), 2 * bits),
            ("hilbert", _hilbert_py(qa, qb, bits), 2 * bits),
        ):
            seg = key * n_segments // (1 << dbits)
            box = keyed.setdefault((layout, seg), [qa, qa, qb, qb])
            box[0], box[1] = min(box[0], qa), max(box[1], qa)
            box[2], box[3] = min(box[2], qb), max(box[3], qb)
    out = {}
    for (layout, _), (a0, a1, b0, b1) in keyed.items():
        r = out.setdefault(layout, [0, 0, 0, 0])
        r[0] += 1
        r[1] += (a1 - a0 + 1) * (b1 - b0 + 1)
        r[2] += a1 - a0 + 1
        r[3] += b1 - b0 + 1
    return {k: tuple(v) for k, v in out.items()}


def test_advisor_matches_pure_python_replay(spark):
    rng = np.random.default_rng(916)
    # clustered, non-uniform points over a wide unquantized domain
    pts = [
        (int(rng.integers(0, 10_000)), int(rng.integers(0, 3) * 400 + rng.integers(0, 50)))
        for _ in range(800)
    ]
    df = spark.createDataFrame(pts, "a long, b long")
    got = {
        r["layout"]: (
            r["n_nonempty"],
            r["sum_bbox_area"],
            r["sum_span_a"],
            r["sum_span_b"],
        )
        for r in layout_advisor(df, "a", "b", bits=6, n_segments=20).collect()
    }
    assert got == _advisor_py(pts, bits=6, n_segments=20)


def test_advisor_shows_the_known_layout_trades(spark):
    # full 64x64 grid: every quantized cell occupied
    pts = [(a, b) for a in range(64) for b in range(64)]
    df = spark.createDataFrame(pts, "a long, b long")
    rows = {
        r["layout"]: r
        for r in layout_advisor(df, "a", "b", bits=6, n_segments=48).collect()
    }
    # single-sort: contiguous disjoint slices of the a domain, no b pruning
    assert rows["sort_a"]["sum_span_a"] == 64
    assert rows["sort_a"]["sum_span_b"] == rows["sort_a"]["n_nonempty"] * 64
    # the curves prune BOTH dimensions: each far below sort_a's b exposure
    for curve in ("morton", "hilbert"):
        assert rows[curve]["sum_span_b"] < rows["sort_a"]["sum_span_b"] / 4
    # at a non-power-of-4 segment count Hilbert's segments stay connected
    # blobs while Morton segments straddle quadrant seams
    assert rows["hilbert"]["sum_bbox_area"] < rows["morton"]["sum_bbox_area"]

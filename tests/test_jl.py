"""pipeline/similarity.py::random_projection_sketch: pure-Python replay
of the quantize+sign arithmetic, sketch determinism for identical
vectors, and approximate inner-product preservation on planted
orthogonal-ish inputs. Cross-engine exactness is covered by
test_queries_oracle.py (embedding_jl_projection)."""

from __future__ import annotations

import math

from csv_query_engine_spark.pipeline.similarity import (
    jl_signs,
    random_projection_sketch,
)

D = 16
OUT = 4


def _vecs():
    # deterministic synthetic vectors; 1 and 2 identical, 3 negated
    base = [math.sin(j + 1) for j in range(D)]
    return [
        (1, base),
        (2, list(base)),
        (3, [-x for x in base]),
        (4, [math.cos(3 * j + 2) for j in range(D)]),
    ]


def _py_sketch(vec, signs):
    q = [math.floor(x * 1e6 + 0.5) for x in vec]
    return [sum(s * qq for s, qq in zip(row, q)) for row in signs]


def test_jl_sketch_replay_and_structure(spark):
    rows = [(i, [float(x) for x in v]) for i, v in _vecs()]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: [r[f"y{i}"] for i in range(OUT)]
        for r in random_projection_sketch(df, out_dims=OUT, in_dims=D).collect()
    }
    signs = jl_signs(OUT, D)
    # float32 storage: replay must quantize the float32-rounded values,
    # exactly like the engines read them back from the array<float>
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    expect = {i: _py_sketch([f32(x) for x in v], signs) for i, v in _vecs()}
    assert got == expect
    # identical inputs -> identical sketches; negated input -> negated
    assert got[1] == got[2]
    assert got[3] == [-y for y in got[1]]

"""Chain-shape matrix with closed-form oracles — the analog of the
reference's crown-jewel test (pipeline.d:1284-1526): many pipeline
shapes x boundary stream lengths, expected output computable in plain
Python (the nibble-tag trick, pipeline.d:711-714), compared
element-exact in stream order.

The reference nibble-tags each element per stage ((a << 4) | mark) so
any chain's output is closed-form; we do the same with value*16+mark
stages. Adapters (repartition hints) are spliced in to assert they are
identity on data AND order, like flod's 12 protocol adapters.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import flod_spark as fs

N = 1734  # boundary base (reference uses 173447; scaled for local runs)
SIZES = [0, N // 3, N - 1, N, N + 1]


def tag(mark: int):
    """Stage: value -> value*16 + mark (closed-form invertible)."""
    return lambda p: p.map_values(F.col("value") * 16 + mark)


def take(k: int):
    return lambda p: p.take(k)


def chunk(c: int):
    return lambda p: p.by_chunk(c)


def hint(n=None):
    return lambda p: p.repartition_hint(n)


# (chain of façade stages, python model over list of ints)
def model_tag(mark):
    return lambda xs: [x * 16 + mark for x in xs]


def model_take(k):
    return lambda xs: xs[:k]


def model_id():
    return lambda xs: xs


CHAINS = [
    ([tag(1)], [model_tag(1)]),
    ([take(7)], [model_take(7)]),
    ([tag(1), take(7)], [model_tag(1), model_take(7)]),
    ([take(7), tag(2)], [model_take(7), model_tag(2)]),
    ([hint(4), tag(3)], [model_id(), model_tag(3)]),
    ([tag(1), hint(8), take(100)], [model_tag(1), model_id(), model_take(100)]),
    ([take(100), hint(), take(11)], [model_take(100), model_id(), model_take(11)]),
    ([tag(1), tag(2), tag(3)], [model_tag(1), model_tag(2), model_tag(3)]),
    ([hint(2), take(50), hint(4), tag(5), take(13)],
     [model_id(), model_take(50), model_id(), model_tag(5), model_take(13)]),
    ([take(N + 500)], [model_take(N + 500)]),  # limit >> length (package.d:218)
]


@pytest.mark.parametrize("size", SIZES)
@pytest.mark.parametrize("ci", range(len(CHAINS)))
def test_chain_matrix(spark, size, ci):
    stages, models = CHAINS[ci]
    p = fs.from_range(spark, 0, size).ordered_by("value")
    xs = list(range(size))
    for st, m in zip(stages, models):
        p = st(p)
        xs = m(xs)
    rows = p.to_array()
    got = [r.value for r in sorted(rows, key=lambda r: r.seq)]
    assert got == xs, f"chain {ci} size {size}"


@pytest.mark.parametrize("size", [0, 5, N])
def test_chunk_ids_closed_form(spark, size):
    p = fs.from_range(spark, 0, size).ordered_by("value").by_chunk(16)
    rows = sorted(p.to_array(), key=lambda r: r.seq)
    assert [r.chunk_id for r in rows] == [i // 16 for i in range(size)]
    assert [r.value for r in rows] == list(range(size))

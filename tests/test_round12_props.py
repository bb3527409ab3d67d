"""Round-12 property tests — driver-side (no Spark session), fuzzing
the WARC Content-Length framing and the sign-bit packing against
adversarial inputs:

- _warc_shard_bytes -> _warc_records must round-trip ANY payload
  byte-exactly — including payloads that contain CRLF blank lines,
  'WARC/1.0' headers-as-text, or NUL bytes — because the parser skips
  payloads by declared length and never scans their bytes;
- the _bq_word packing rule (bit j of word w = dim 32w+j > 0) matches
  an independent numpy reference for arbitrary float vectors,
  including zeros and negative zeros (strict '> 0' puts both in the
  0 bit).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

_adversarial_text = st.lists(
    st.sampled_from(
        list("ab\r\n:\x00π")
        + ["WARC/1.0", "Content-Length: 3", "\r\n\r\n", "WARC-Type: response"]
    ),
    max_size=12,
).map("".join)


@given(st.lists(_adversarial_text, max_size=8))
@settings(max_examples=200, deadline=None)
def test_warc_framing_roundtrips_adversarial_payloads(texts):
    from flod_spark.catalog.surface import _warc_records, _warc_shard_bytes

    pairs = list(enumerate(texts))
    got = _warc_records(_warc_shard_bytes(pairs))
    assert got == [
        (f"doc_{did:06d}.txt", str(t).encode("utf-8")) for did, t in pairs
    ]


@given(
    st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        min_size=64,
        max_size=64,
    )
)
@settings(max_examples=200, deadline=None)
def test_bq_word_rule_matches_numpy(vec):
    # the SQL rule both engines share, evaluated in pure Python
    words = []
    for w in range(2):
        acc = 0
        for j in range(32):
            if vec[32 * w + j] > 0:
                acc += 1 << j
        words.append(acc)
    v = np.asarray(vec)
    ref = [
        int(sum(1 << j for j in range(32) if v[32 * w + j] > 0)) for w in range(2)
    ]
    assert words == ref
    # hamming via xor/popcount == bit-disagreement count
    other = -v
    ow = [
        int(sum(1 << j for j in range(32) if other[32 * w + j] > 0))
        for w in range(2)
    ]
    ham = sum(bin(words[w] ^ ow[w]).count("1") for w in range(2))
    assert ham == int(((v > 0) != (other > 0)).sum())

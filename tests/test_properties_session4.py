"""Property tests for this session's pure-logic kernels (no Spark).

The Spark-side parity tests prove end-to-end equality on the harness
corpus; these pin the ALGORITHMIC guarantees the operators rely on, on
adversarial inputs hypothesis generates.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from sigma_rx7_spark.functions.text import _misra_gries_partition


def _py_spread16(x: int) -> int:
    x &= 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def _py_morton(a: int, b: int) -> int:
    return _py_spread16(a) | (_py_spread16(b) << 1)


@given(st.integers(0, 0xFFFF), st.integers(0, 0xFFFF))
def test_morton_bit_exact(a, b):
    # reference interleave: bit i of a -> bit 2i, bit i of b -> 2i+1
    expect = 0
    for i in range(16):
        expect |= ((a >> i) & 1) << (2 * i)
        expect |= ((b >> i) & 1) << (2 * i + 1)
    assert _py_morton(a, b) == expect


@given(st.integers(0, 0xFFFF), st.integers(0, 0xFFFF),
       st.integers(0, 0xFFFF), st.integers(0, 0xFFFF))
def test_morton_injective_and_monotone_per_axis(a, b, a2, b2):
    if (a, b) != (a2, b2):
        assert _py_morton(a, b) != _py_morton(a2, b2)
    # fixing one axis, the key is monotone in the other (what makes a
    # morton RANGE a contiguous run within each axis-aligned slab)
    if a < a2:
        assert _py_morton(a, b) < _py_morton(a2, b)
    if b < b2:
        assert _py_morton(a, b) < _py_morton(a, b2)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(0, 30).map(str), min_size=1, max_size=2000),
       st.integers(2, 16))
def test_misra_gries_superset_guarantee(words, capacity):
    """Any word with count > n/capacity MUST survive the summary —
    the property that makes the heavy-hitter recount EXACT."""
    out = list(_misra_gries_partition(
        iter([pd.DataFrame({"word": words})]), capacity=capacity))
    kept = set(out[0]["word"]) if out else set()
    n = len(words)
    for w, c in Counter(words).items():
        if c > n / capacity:
            assert w in kept, (w, c, n, capacity)


# ---- HL7 escape/unescape round trip --------------------------------------

from sigma_rx7_spark.domain.hl7 import _HL7_ESC, _unesc_py  # noqa: E402


def _esc_py(s: str) -> str:
    for raw, esc in _HL7_ESC:
        s = s.replace(raw, esc)
    return s


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="|^~&\\EFSRT abc", max_size=40))
def test_hl7_escape_roundtrip_dense_delimiters(s):
    """Lossless encode/decode on delimiter-dense adversarial text —
    including strings that LOOK like escape sequences (the global-
    replace decoder failed exactly here: '|E|' -> '\\F\\E\\F\\' has a
    false \\E\\ spanning two real tokens)."""
    assert _unesc_py(_esc_py(s)) == s


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=60))
def test_hl7_escape_roundtrip_unicode(s):
    assert _unesc_py(_esc_py(s)) == s

"""Property-based invariants for the textprep operators — pure-Python
properties (no Spark session) so hypothesis can hammer hundreds of
examples cheaply.

- BPE: apply is total, round-trips the input, and training merges are
  insensitive to word-table order (the algorithm is a pure function of
  the multiset).
- resize_nearest: output shape is exact, every output pixel exists in
  the source (nearest-neighbor never invents values), and identity
  resize is the identity.
- corpus_shuffle's floor index map (shared with resize): covers the
  whole range monotonically.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fluent_bit_spark.textprep.bpe import END, bpe_train, encode_word
from fluent_bit_spark.textprep.multimodal import resize_nearest

words = st.text(alphabet="abcde", min_size=1, max_size=8)
word_tables = st.lists(
    st.tuples(words, st.integers(min_value=1, max_value=50)),
    min_size=1,
    max_size=12,
)


@settings(max_examples=200, deadline=None)
@given(wc=word_tables, n_merges=st.integers(min_value=0, max_value=12))
def test_bpe_encode_round_trips_any_word(wc, n_merges):
    merges = bpe_train(wc, n_merges=n_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in wc:
        toks = encode_word(w, ranks)
        # concatenation restores the word + end marker, no token empty
        assert "".join(toks) == w + END
        assert all(toks)


@settings(max_examples=100, deadline=None)
@given(wc=word_tables)
def test_bpe_train_order_insensitive(wc):
    merges_fwd = bpe_train(wc, n_merges=8)
    merges_rev = bpe_train(list(reversed(wc)), n_merges=8)
    assert merges_fwd == merges_rev


@settings(max_examples=200, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=12),
    w=st.integers(min_value=1, max_value=12),
    oh=st.integers(min_value=1, max_value=12),
    ow=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_resize_nearest_properties(h, w, oh, ow, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 1), dtype=np.uint8)
    out = resize_nearest(px, ow, oh)
    assert out.shape == (oh, ow, 1)
    # every output value is some source value (no interpolation)
    assert set(out.ravel().tolist()) <= set(px.ravel().tolist())
    # identity resize is the identity
    assert (resize_nearest(px, w, h) == px).all()


@settings(max_examples=200, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=1000),
    out_n=st.integers(min_value=1, max_value=64),
)
def test_floor_index_map_covers_monotonically(n, out_n):
    idx = (np.arange(out_n) * n) // out_n
    assert idx[0] == 0
    assert (np.diff(idx) >= 0).all()
    assert idx[-1] < n
    # upsampling (out_n >= n) must visit every source index
    if out_n >= n:
        assert set(idx.tolist()) == set(range(n))

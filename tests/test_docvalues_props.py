"""Property tests for the doc-values primitives: encode_lang_codes vs a
pure-Python reference over random vocabularies/columns, and
ord_upper_bound vs the sorted-array definition over random docmaps.
No Ray needed — pure kernel properties."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from splade_ray.docmap import LANG_MISSING, encode_lang_codes

langs = st.sampled_from(["", "en", "de", "fr", "zh", "py", "go", "xx"])
cells = st.one_of(st.none(), langs)


@settings(max_examples=200, deadline=None)
@given(st.lists(cells, max_size=50), st.lists(langs, max_size=6))
def test_encode_lang_codes_matches_reference(values, vocab_raw):
    vocab = sorted({v for v in vocab_raw if v})
    got = encode_lang_codes(pa.array(values, type=pa.string()), vocab)
    want = []
    for v in values:
        if v and v in vocab:
            want.append(vocab.index(v))
        else:
            want.append(LANG_MISSING)
    assert got.tolist() == want
    assert got.dtype == np.uint8


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 10**9), min_size=1, max_size=60,
                unique=True),
       st.integers(-5, 10**9 + 5))
def test_ord_upper_bound_definition(ids, cursor):
    """ord_upper_bound(doc) == count of map entries with id <= doc — the
    first ordinal strictly after the cursor — on the flat layout."""
    import os
    import tempfile

    from splade_ray.docmap import FlatDocArrays

    arr = np.sort(np.asarray(ids, dtype=np.int64))
    with tempfile.TemporaryDirectory() as d:
        arr.tofile(os.path.join(d, "docmap.bin"))
        np.ones(len(arr), dtype=np.int32).tofile(
            os.path.join(d, "doclens.bin"))
        fda = FlatDocArrays(d)
        got = fda.ord_upper_bound(cursor)
    assert got == int((arr <= cursor).sum())

"""Textstats kernels: vectorized fingerprint64 + batch fingerprints."""

import numpy as np
import pyarrow as pa


def test_fingerprint64_pinned_and_vectorized():
    """Pinned values for the sliding-window splitmix64 fingerprint (any
    kernel change must be deliberate), incl. empty / sub-8-byte padding."""
    from pawpaw_ray.stages.textstats import fingerprint64

    assert fingerprint64("") == 0
    assert fingerprint64("abc") == 14748925474485784209
    long = ("word7 ") * 700
    assert fingerprint64(long) == fingerprint64(long + "ignored past 4KiB")
    # min-of-windows: adding content can only lower (or keep) the value
    assert fingerprint64("abcdefghij" * 4) <= fingerprint64("abcdefgh")


def test_fingerprint_batch_columns():
    from pawpaw_ray.stages.textstats import fingerprint64, fingerprint_batch

    b = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": ["Hello   World", "hello world"]})
    out = fingerprint_batch(b)
    # whitespace-normalized + casefolded: both rows fingerprint identically
    assert out["content_sha1"][0].as_py() == out["content_sha1"][1].as_py()
    assert (out["fingerprint64"][0].as_py() == out["fingerprint64"][1].as_py()
            == fingerprint64("hello world"))

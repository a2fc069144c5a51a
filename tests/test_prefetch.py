"""Device-prefetch iterator: ordering, completeness, error propagation."""

import numpy as np
import pytest

from pytorch_news_recommender_tpu.data.prefetch import device_prefetch


def _shardings(batch):
    import jax
    s = jax.sharding.SingleDeviceSharding(jax.devices("cpu")[0])
    return {k: s for k in batch}


def test_order_and_completeness():
    batches = [{"a": np.full((4,), i, np.int32)} for i in range(7)]
    out = list(device_prefetch(iter(batches), _shardings, depth=2))
    assert len(out) == 7
    for i, b in enumerate(out):
        assert int(np.asarray(b["a"])[0]) == i


def test_error_propagates():
    def gen():
        yield {"a": np.zeros(2, np.int32)}
        raise RuntimeError("boom")

    it = device_prefetch(gen(), _shardings)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)

"""Background host->device prefetching (tpusr/data/prefetch.py): order and
exception semantics identical to direct iteration, and trainer histories are
bit-identical with and without it (it only overlaps, never reorders)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpusr.data.prefetch import prefetch_iterator
from tpusr.models import SRCNN
from tpusr.train import SupervisedSRTrainer


def test_order_preserved_and_lazy_bound():
    produced = []

    def gen():
        for i in range(50):
            produced.append(i)
            yield i

    it = prefetch_iterator(gen(), depth=4)
    out = [next(it) for _ in range(10)]
    assert out == list(range(10))
    # bounded readahead: the reader can be at most depth+2 ahead
    # (queue depth + one blocked put + one yielded)
    assert len(produced) <= 10 + 4 + 2
    assert list(it) == list(range(10, 50))


def test_generator_exception_reraises_at_consumer():
    def gen():
        yield 1
        yield 2
        raise ValueError("boom")

    it = prefetch_iterator(gen(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_depth_zero_is_direct_iteration():
    g = (i for i in range(3))
    assert prefetch_iterator(g, depth=0) is not None
    assert list(prefetch_iterator((i for i in range(3)), depth=0)) == [0, 1, 2]


def test_fit_history_identical_with_prefetch():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((10, 8, 8, 3), np.float32))
    y = jnp.asarray(rng.random((10, 8, 8, 3), np.float32))

    hists = []
    for depth in (0, 3):
        tr = SupervisedSRTrainer(SRCNN(), learning_rate=1e-3)
        res = tr.fit(x[:8], y[:8], x[8:], y[8:], batch_size=4, epochs=2,
                     verbose=False, prefetch=depth)
        hists.append(res.history)
    for k in ("loss", "val_loss", "psnr"):
        assert hists[0][k] == hists[1][k], k


def test_abandoned_consumer_unblocks_reader():
    """Closing the consumer mid-stream (exception/break in the training loop)
    must let the reader thread exit instead of blocking forever on q.put."""
    import threading
    import time

    from tpusr.data.prefetch import prefetch_iterator

    before = threading.active_count()
    it = prefetch_iterator(iter(range(100000)), depth=2)
    assert next(it) == 0
    it.close()  # GeneratorExit -> finally -> stop flag
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before

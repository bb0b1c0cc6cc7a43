"""Async checkpointing: device-side snapshot + background write, periodic
resume points from fit (reference has no mid-training resume at all;
SRCNN_model.py:249-259 saves only at the end)."""

import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpusr.models import SRCNN
from tpusr.train import (SupervisedSRTrainer, save_checkpoint_async,
                         restore_checkpoint, load_metadata)


def test_async_save_restore_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((4,), jnp.int32)}
    h = save_checkpoint_async(str(tmp_path), "ck", tree, metadata={"k": 1})
    path = h.wait(60)
    assert h.done() and path.endswith("ck")
    got = restore_checkpoint(str(tmp_path), "ck", tree)
    np.testing.assert_array_equal(np.asarray(got["a"]), np.asarray(tree["a"]))
    np.testing.assert_array_equal(np.asarray(got["b"]), np.asarray(tree["b"]))
    assert load_metadata(str(tmp_path), "ck") == {"k": 1}


def test_async_save_snapshot_is_isolated(tmp_path):
    """Mutating (donating) the source buffers after the call must not
    corrupt the checkpoint — the save works from a device-side copy."""
    x = jnp.ones((256, 256))
    h = save_checkpoint_async(str(tmp_path), "iso", {"x": x})
    # clobber the source right away (same effect as the train step's donation)
    x = jax.jit(lambda a: a * 0.0, donate_argnums=0)(x)
    h.wait(60)
    got = restore_checkpoint(str(tmp_path), "iso", {"x": x})
    assert float(np.asarray(got["x"]).sum()) == 256 * 256


def test_async_save_error_surfaces_at_wait(tmp_path):
    blocker = tmp_path / "not_a_dir"
    blocker.write_text("file, not a directory")
    h = save_checkpoint_async(str(blocker / "sub"), "ck", {"x": jnp.ones(3)})
    with pytest.raises(Exception):
        h.wait(60)


def test_fit_periodic_checkpoints(tmp_path):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((10, 8, 8, 3), np.float32))
    y = jnp.asarray(rng.random((10, 8, 8, 3), np.float32))
    tr = SupervisedSRTrainer(SRCNN(f1=4, f2=2), learning_rate=1e-3)
    res = tr.fit(x[:8], y[:8], x[8:], y[8:], batch_size=4, epochs=3,
                 verbose=False, checkpoint_dir=str(tmp_path),
                 checkpoint_every=2)
    assert (tmp_path / "epoch_0002").exists()
    assert not (tmp_path / "epoch_0003").exists()  # every=2
    meta = load_metadata(str(tmp_path), "epoch_0002")
    assert meta["epoch"] == 2 and np.isfinite(meta["val_loss"])
    # the periodic file is a true resume point: restore into a fresh state
    template = tr.init_state(x[:1])
    restored = restore_checkpoint(str(tmp_path), "epoch_0002", template)
    ev = tr.eval_step(
        template.replace(params=restored.params), x[8:], y[8:])
    assert np.isfinite(float(ev["loss"]))


def test_cli_checkpoint_every_kwargs(tmp_path):
    """--checkpoint-every N routes periodic resume points into --out; 0/absent
    leaves fit untouched; --resume from a periodic point continues the
    epoch numbering (no overwrite of newer progress with smaller labels)."""
    from argparse import Namespace
    from tpusr.cli.__main__ import _ckpt_kwargs
    from tpusr.train import save_checkpoint

    assert _ckpt_kwargs(Namespace(out="ck")) == {}
    assert _ckpt_kwargs(Namespace(out="ck", checkpoint_every=0)) == {}
    assert _ckpt_kwargs(Namespace(out="ck", checkpoint_every=5)) == {
        "checkpoint_dir": "ck", "checkpoint_every": 5, "checkpoint_offset": 0}

    path = save_checkpoint(str(tmp_path), "epoch_0010", {"x": jnp.ones(2)},
                           metadata={"epoch": 10, "val_loss": 0.5})
    kw = _ckpt_kwargs(Namespace(out="ck", checkpoint_every=2, resume=path))
    assert kw["checkpoint_offset"] == 10
    # resume from an end-of-run checkpoint (no epoch metadata): offset 0
    path2 = save_checkpoint(str(tmp_path), "SRCNN_x", {"x": jnp.ones(2)})
    kw2 = _ckpt_kwargs(Namespace(out="ck", checkpoint_every=2, resume=path2))
    assert kw2["checkpoint_offset"] == 0


def test_cli_maybe_resume_restores_full_state(tmp_path):
    """--resume plumbing: a checkpoint written by the CLI's _save_run format
    restores params AND optimizer state into a fresh trainer."""
    from argparse import Namespace
    from tpusr.train import save_checkpoint
    from tpusr.cli.__main__ import _maybe_resume

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((4, 8, 8, 3), np.float32))
    tr = SupervisedSRTrainer(SRCNN(f1=4, f2=2), learning_rate=1e-3)
    st = tr.init_state(x[:1])
    st, _ = tr.train_step(st, x, x)  # non-trivial Adam moments
    path = save_checkpoint(str(tmp_path), "SRCNN_x", st)

    got = _maybe_resume(Namespace(resume=path), tr, (x[:1],))
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert _maybe_resume(Namespace(resume=None), tr, (x[:1],)) is None


def test_cli_maybe_resume_replicates_on_mesh(tmp_path):
    """--resume with --data-parallel: the restored state comes back
    replicated over the trainer's mesh, not as host arrays."""
    from argparse import Namespace
    from tpusr.dist import make_mesh
    from tpusr.train import save_checkpoint
    from tpusr.cli.__main__ import _maybe_resume

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((8, 8, 8, 3), np.float32))
    plain = SupervisedSRTrainer(SRCNN(f1=4, f2=2))
    path = save_checkpoint(str(tmp_path), "ck", plain.init_state(x[:1]))

    mesh = make_mesh(8)
    tr = SupervisedSRTrainer(SRCNN(f1=4, f2=2), mesh=mesh)
    got = _maybe_resume(Namespace(resume=path), tr, (x[:1],))
    leaf = jax.tree.leaves(got.params)[0]
    assert getattr(leaf.sharding, "mesh", None) is not None
    st, m = tr.train_step(got, x, x)
    assert np.isfinite(float(m["loss"]))


def test_fit_checkpoint_offset_continues_numbering(tmp_path):
    """A resumed run's periodic saves continue the original epoch numbering
    instead of overwriting newer files with smaller labels."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((8, 8, 8, 3), np.float32))
    tr = SupervisedSRTrainer(SRCNN(f1=4, f2=2), learning_rate=1e-3)
    tr.fit(x[:6], x[:6], x[6:], x[6:], batch_size=4, epochs=2, verbose=False,
           checkpoint_dir=str(tmp_path), checkpoint_every=1,
           checkpoint_offset=10)
    names = sorted(d for d in os.listdir(tmp_path) if not d.endswith(".json"))
    assert names == ["epoch_0011", "epoch_0012"], names
    assert load_metadata(str(tmp_path), "epoch_0012")["epoch"] == 12


def test_fit_surfaces_periodic_save_failure(tmp_path, monkeypatch):
    """A failed periodic write must raise out of fit (at the next save's
    wait or the final wait) — not vanish when its handle is replaced."""
    import tpusr.train.checkpoint as ckpt_mod

    real_save = ckpt_mod.save_checkpoint
    calls = {"n": 0}

    def failing_save(directory, name, tree, metadata=None):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("disk full (injected)")
        return real_save(directory, name, tree, metadata)

    monkeypatch.setattr(ckpt_mod, "save_checkpoint", failing_save)

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((8, 8, 8, 3), np.float32))
    tr = SupervisedSRTrainer(SRCNN(f1=4, f2=2), learning_rate=1e-3)
    with pytest.raises(OSError, match="disk full"):
        tr.fit(x[:6], x[:6], x[6:], x[6:], batch_size=4, epochs=4,
               verbose=False, es_patience=10, plateau_patience=10,
               checkpoint_dir=str(tmp_path), checkpoint_every=1)
    assert calls["n"] >= 2

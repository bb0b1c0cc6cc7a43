"""`tpusr convert` CLI: .h5 <-> tpusr-checkpoint round-trips through the
facade loaders/exporters (reference artifact format: SRCNN_model.py:249-259
et al.). Per-network export bit-exactness is covered in test_keras_export;
this drives the CLI wiring end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpusr.cli.__main__ import main
from tpusr.models import SRCNN


def _random_srcnn_params(seed=1):
    v = SRCNN().init(jax.random.PRNGKey(0), jnp.zeros((1, 24, 24, 3)))
    leaves, treedef = jax.tree_util.tree_flatten(v["params"])
    rng = np.random.default_rng(seed)
    return v["params"], jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(rng.standard_normal(l.shape, dtype=np.float32)
                              * 0.1) for l in leaves])


@pytest.mark.slow  # builds Keras twins (TF) on both legs
def test_convert_srcnn_h5_ckpt_h5_roundtrip(tmp_path):
    pytest.importorskip("tensorflow")
    from tpusr.train.keras_export import export_srcnn
    from tpusr.train.keras_import import import_srcnn

    template, params = _random_srcnn_params()
    src_h5 = str(tmp_path / "SRCNN_ref.h5")
    export_srcnn(params, src_h5)

    ckpt_dir = str(tmp_path / "ckpts")
    main(["convert", "--model", "srcnn", "--src", src_h5,
          "--out", ckpt_dir, "--timestamp", "t0"])
    ckpt = str(tmp_path / "ckpts" / "SRCNN_t0")

    out_dir = str(tmp_path / "h5out")
    main(["convert", "--model", "srcnn", "--src", ckpt,
          "--out", out_dir, "--timestamp", "t1"])

    back = import_srcnn(template, str(tmp_path / "h5out" / "SRCNN_t1.h5"))
    for (p, a), b in zip(jax.tree_util.tree_leaves_with_path(back),
                         jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(p))


def test_convert_requires_model_and_src(capsys):
    with pytest.raises(SystemExit):
        main(["convert", "--model", "srcnn"])  # --src missing
    with pytest.raises(SystemExit):
        main(["convert", "--src", "x.h5"])  # --model missing

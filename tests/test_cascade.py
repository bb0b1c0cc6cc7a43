"""Confidence-cascade serving mode tests (tpusr/pipeline/cascade.py).

The cascade's contract: shared-trunk int8 votes, with the K least-confident
images of each batch re-classified by the exact per-patch int8 path and
served those votes instead. Both parents have independent exactness/parity
tests (test_shared_trunk.py, test_quant.py); here we pin the MERGE itself:
the selection (static top-K on trunk confidence), the scatter, and the
full-escalation degenerate case (frac=1.0 must reproduce the per-patch path
bit-for-bit). Trained-weight flip behavior at protocol scale is certified by
the serving gate's derived cascade rows (GATE_r04.json).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpusr.core.pad import pad_amounts
from tpusr.core.patches import patchify
from tpusr.models import VGG16Classifier
from tpusr.models.quant import (calibrate_vgg16, quantize_input,
                                quantize_vgg16, quantized_vgg16_apply)
from tpusr.models.vgg_trunk import shared_trunk_probs_int8
from tpusr.pipeline.cascade import make_cascade_votes
from tpusr.pipeline.defect_pipeline import _vote

PATCH, STRIDE = 32, 16  # smallest trunk-legal geometry (stride%16, patch%32)
HW = 64                 # 3x3 patch grid, zero pad


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    m = VGG16Classifier(num_classes=2, dropout_rate=0.0)
    params = m.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, PATCH, PATCH, 3)))["params"]
    calib = rng.random((4, PATCH, PATCH, 3)).astype(np.float32)
    qtree = quantize_vgg16(params, calibrate_vgg16(params, calib))
    imgs = jnp.asarray(rng.random((4, HW, HW, 3), dtype=np.float32))
    return qtree, imgs


def _per_patch_votes(qtree, imgs):
    """The certified escalation target: exact per-patch int8 votes."""
    h, w = imgs.shape[1:3]
    pad_h, pad_w = pad_amounts(h, w, PATCH, STRIDE)

    def per_image(img):
        x = jnp.pad(img, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
        return patchify(x, PATCH, STRIDE)

    patches = jax.vmap(per_image)(quantize_input(qtree, imgs))
    flat = patches.reshape((-1,) + patches.shape[2:])
    probs = quantized_vgg16_apply(qtree, flat)
    probs = probs.reshape(imgs.shape[0], -1, probs.shape[-1])
    return jax.vmap(_vote)(probs)


def _trunk_votes(qtree, imgs):
    probs = shared_trunk_probs_int8(qtree, imgs, PATCH, STRIDE)
    return jax.vmap(_vote)(probs)


@pytest.mark.slow  # ~190s: real int8 VGG16 trunk + per-patch compiles on CPU
def test_full_escalation_equals_per_patch(setup):
    qtree, imgs = setup
    cls_c, conf_c = make_cascade_votes(qtree, PATCH, STRIDE,
                                       escalate_frac=1.0)(imgs)
    cls_p, conf_p = _per_patch_votes(qtree, imgs)
    np.testing.assert_array_equal(np.asarray(cls_c), np.asarray(cls_p))
    np.testing.assert_allclose(np.asarray(conf_c), np.asarray(conf_p),
                               atol=1e-6)


@pytest.mark.slow  # ~200s; the merge contract also has a fast stubbed twin
def test_partial_escalation_merge_semantics(setup):
    qtree, imgs = setup
    cls_t, conf_t = map(np.asarray, _trunk_votes(qtree, imgs))
    cls_p, conf_p = map(np.asarray, _per_patch_votes(qtree, imgs))
    # k = round(4 * 0.5) = 2 least-trunk-confident images escalate
    idx = np.argsort(conf_t, kind="stable")[:2]
    want_cls, want_conf = cls_t.copy(), conf_t.copy()
    want_cls[idx], want_conf[idx] = cls_p[idx], conf_p[idx]

    cls_c, conf_c = make_cascade_votes(qtree, PATCH, STRIDE,
                                       escalate_frac=0.5)(imgs)
    np.testing.assert_array_equal(np.asarray(cls_c), want_cls)
    np.testing.assert_allclose(np.asarray(conf_c), want_conf, atol=1e-6)


@pytest.mark.slow  # ~150s: int8 CPU convs
def test_accepts_prequantized_int8(setup):
    qtree, imgs = setup
    votes = make_cascade_votes(qtree, PATCH, STRIDE, escalate_frac=0.5)
    a = votes(imgs)
    b = votes(quantize_input(qtree, imgs))
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), atol=0)


def test_escalate_frac_validation():
    # validation raises before the qtree is touched — no fixture (the module
    # fixture costs ~15s of VGG16 quantization compile in the quick loop)
    with pytest.raises(ValueError):
        make_cascade_votes({}, PATCH, STRIDE, escalate_frac=0.0)
    with pytest.raises(ValueError):
        make_cascade_votes({}, PATCH, STRIDE, escalate_frac=1.5)
    with pytest.raises(ValueError):
        make_cascade_votes({}, PATCH, STRIDE, escalate_score="margin")


def test_vote_frac_selection_fast(monkeypatch):
    """escalate_score='vote_frac' ranks by patch agreement (conf as exact
    lexicographic tie-break), selecting DIFFERENT images than 'conf' when
    a high-confidence image has disagreeing patches — the measured failure
    shape of the worst GATE_r04 seed."""
    import tpusr.pipeline.cascade as casc
    from tpusr.tools.serving_gate import _lex_score

    imgs = (jnp.arange(4 * 2 * 2 * 3, dtype=jnp.float32)
            .reshape(4, 2, 2, 3) / 48.0)
    img_means = imgs.mean(axis=(1, 2, 3))
    # 4 patches per image. vote_frac: [0.5, 1.0, 0.75, 1.0];
    # conf (mean winning prob): [0.55, 0.60, 0.70, 0.95]
    # conf ranking escalates {0, 1}; vote_frac ranking escalates {0, 2}
    trunk_probs = jnp.array([
        [[0.9, 0.1], [0.2, 0.8], [0.4, 0.6], [0.7, 0.3]],   # split 2/2
        [[0.4, 0.6], [0.45, 0.55], [0.35, 0.65], [0.4, 0.6]],  # unanimous
        [[0.8, 0.2], [0.9, 0.1], [0.7, 0.3], [0.4, 0.6]],   # 3/1
        [[0.05, 0.95], [0.05, 0.95], [0.05, 0.95], [0.05, 0.95]],
    ])
    pp_table = jnp.array([[0.2, 0.8], [0.99, 0.01],
                          [0.3, 0.7], [0.98, 0.02]])

    def pp_apply(qtree, flat):
        means = flat.mean(axis=(1, 2, 3))
        idx = jnp.argmin(jnp.abs(means[:, None] - img_means[None, :]),
                         axis=1)
        return pp_table[idx]

    monkeypatch.setattr(casc, "quantize_input", lambda q, x: x)
    monkeypatch.setattr(casc, "shared_trunk_probs_int8",
                        lambda q, x, p, s: trunk_probs)
    monkeypatch.setattr(casc, "quantized_vgg16_apply", pp_apply)

    cls_t, conf_t = map(np.asarray, jax.vmap(_vote)(trunk_probs))
    preds = np.asarray(jnp.argmax(trunk_probs, axis=-1))
    vote_frac = (preds == cls_t[:, None]).mean(axis=1)
    # patch=stride=1 on 2x2 images -> 4 patches, matching trunk_probs
    lex = _lex_score(vote_frac, conf_t, 4)
    esc = np.argsort(lex, kind="stable")[:2]
    assert set(esc.tolist()) == {0, 2}
    esc_conf = np.argsort(conf_t, kind="stable")[:2]
    assert set(esc_conf.tolist()) == {0, 1}  # the two scores disagree

    cls_p, conf_p = map(np.asarray, jax.vmap(_vote)(pp_table[:, None, :]))
    want_cls, want_conf = cls_t.copy(), conf_t.copy()
    want_cls[esc], want_conf[esc] = cls_p[esc], conf_p[esc]
    cls_c, conf_c = make_cascade_votes(
        {}, patch=1, stride=1, escalate_frac=0.5,
        escalate_score="vote_frac")(imgs)
    np.testing.assert_array_equal(np.asarray(cls_c), want_cls)
    np.testing.assert_allclose(np.asarray(conf_c), want_conf, atol=1e-6)


def test_merge_selection_fast(monkeypatch):
    """Fast twin of the merge contract: stub both classifier parents with
    fixed probability tables and pin the selection (static top-K on trunk
    confidence), the routing of escalated patches, and the scatter — the
    real-network exactness twins above are slow-marked."""
    import tpusr.pipeline.cascade as casc

    # 4 images, patch=stride=2 -> one 2x2 patch per image, zero pad
    imgs = (jnp.arange(4 * 2 * 2 * 3, dtype=jnp.float32)
            .reshape(4, 2, 2, 3) / 48.0)
    img_means = imgs.mean(axis=(1, 2, 3))
    # trunk vote confidences: 0.90, 0.60, 0.95, 0.55 -> k=2 escalates {1, 3}
    trunk_probs = jnp.array([[[0.90, 0.10]], [[0.40, 0.60]],
                             [[0.05, 0.95]], [[0.55, 0.45]]])
    # per-patch parent disagrees with the trunk on every image
    pp_table = jnp.array([[0.20, 0.80], [0.99, 0.01],
                          [0.70, 0.30], [0.02, 0.98]])

    def pp_apply(qtree, flat):
        # identify which image each escalated patch came from by its mean
        means = flat.mean(axis=(1, 2, 3))
        idx = jnp.argmin(jnp.abs(means[:, None] - img_means[None, :]),
                         axis=1)
        return pp_table[idx]

    monkeypatch.setattr(casc, "quantize_input", lambda q, x: x)
    monkeypatch.setattr(casc, "shared_trunk_probs_int8",
                        lambda q, x, p, s: trunk_probs)
    monkeypatch.setattr(casc, "quantized_vgg16_apply", pp_apply)

    cls_c, conf_c = make_cascade_votes({}, patch=2, stride=2,
                                       escalate_frac=0.5)(imgs)
    cls_t, conf_t = map(np.asarray, jax.vmap(_vote)(trunk_probs))
    cls_p, conf_p = map(np.asarray,
                        jax.vmap(_vote)(pp_table[:, None, :]))
    want_cls, want_conf = cls_t.copy(), conf_t.copy()
    esc = np.argsort(conf_t, kind="stable")[:2]
    assert set(esc.tolist()) == {1, 3}
    want_cls[esc], want_conf[esc] = cls_p[esc], conf_p[esc]
    np.testing.assert_array_equal(np.asarray(cls_c), want_cls)
    np.testing.assert_allclose(np.asarray(conf_c), want_conf, atol=1e-6)


def test_pad_rows_never_escalate_fast(monkeypatch):
    """n_valid masks batch-padding rows out of the escalation ranking:
    PipelineServer pads partial batches by repeating the last real image, and
    duplicate low-score pad rows must not displace real low-confidence images
    from the static top-K (the GATE-certified coverage is over REAL images)."""
    import tpusr.pipeline.cascade as casc

    imgs = (jnp.arange(4 * 2 * 2 * 3, dtype=jnp.float32)
            .reshape(4, 2, 2, 3) / 48.0)
    img_means = imgs.mean(axis=(1, 2, 3))
    # trunk confidences 0.90, 0.60, 0.95, 0.55; k = 2. Unmasked escalation
    # would pick {1, 3}; with rows {2, 3} marked as padding the two real
    # rows {0, 1} must BOTH escalate instead.
    trunk_probs = jnp.array([[[0.90, 0.10]], [[0.40, 0.60]],
                             [[0.05, 0.95]], [[0.55, 0.45]]])
    pp_table = jnp.array([[0.20, 0.80], [0.99, 0.01],
                          [0.70, 0.30], [0.02, 0.98]])

    def pp_apply(qtree, flat):
        means = flat.mean(axis=(1, 2, 3))
        idx = jnp.argmin(jnp.abs(means[:, None] - img_means[None, :]),
                         axis=1)
        return pp_table[idx]

    monkeypatch.setattr(casc, "quantize_input", lambda q, x: x)
    monkeypatch.setattr(casc, "shared_trunk_probs_int8",
                        lambda q, x, p, s: trunk_probs)
    monkeypatch.setattr(casc, "quantized_vgg16_apply", pp_apply)

    votes = make_cascade_votes({}, patch=2, stride=2, escalate_frac=0.5)
    cls_t, conf_t = map(np.asarray, jax.vmap(_vote)(trunk_probs))
    cls_p, conf_p = map(np.asarray, jax.vmap(_vote)(pp_table[:, None, :]))

    want_cls, want_conf = cls_t.copy(), conf_t.copy()
    want_cls[:2], want_conf[:2] = cls_p[:2], conf_p[:2]
    cls_c, conf_c = votes(imgs, n_valid=jnp.int32(2))
    np.testing.assert_array_equal(np.asarray(cls_c), want_cls)
    np.testing.assert_allclose(np.asarray(conf_c), want_conf, atol=1e-6)

    # n_valid = N is a no-op (identical to the unmasked call)
    a = votes(imgs)
    b = votes(imgs, n_valid=jnp.int32(4))
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))

    # n_valid < K: every real row escalates; leftover slots may fall on pad
    # rows (harmless — the server discards pad results)
    cls_one, _ = votes(imgs, n_valid=jnp.int32(1))
    assert int(cls_one[0]) == int(cls_p[0])


@pytest.mark.slow  # ~155s: compiles the full serving pipeline graph on CPU
def test_serving_pipeline_cascade_mode(setup):
    """make_serving_pipeline(clf_mode='cascade_int8') end-to-end: matches
    cascade_votes applied to the same SR output."""
    from tpusr.models import EDSR
    from tpusr.models.edsr_fast import make_fused_sr_apply
    from tpusr.models.layers import pixel_shuffle
    from tpusr.pipeline import make_serving_pipeline

    qtree, _ = setup
    rng = np.random.default_rng(3)
    sr_model = EDSR(scale_factor=2, num_res_blocks=1)
    sv = sr_model.init(jax.random.PRNGKey(5),
                       jnp.zeros((1, 32, 32, 3)))["params"]
    clf_model = VGG16Classifier(num_classes=2, dropout_rate=0.0)
    cv = clf_model.init(jax.random.PRNGKey(6),
                        jnp.zeros((1, PATCH, PATCH, 3)))["params"]
    calib = rng.random((4, PATCH, PATCH, 3)).astype(np.float32)

    pipe = make_serving_pipeline(
        sv, cv, lr_hw=(32, 32), scale=2, patch=PATCH, stride=STRIDE,
        sr_mode="f32", clf_mode="cascade_int8", calib_patches=calib,
        cascade_escalate_frac=0.5)
    lr = rng.random((4, 32, 32, 3)).astype(np.float32)
    sr, cls, conf = pipe(lr)

    from tpusr.models.quant import calibrate_vgg16 as _cal
    qt = quantize_vgg16(cv, _cal(cv, calib))
    poly_fn, r = make_fused_sr_apply(sv, 2, dtype=jnp.float32)
    sr_ref = pixel_shuffle(poly_fn(jnp.asarray(lr)), r).astype(jnp.float32)
    # the pipeline fuses SR+cascade into one jit graph: FMA reordering moves
    # the SR output by a few ulps vs the two-call composition (atol 1e-5)
    np.testing.assert_allclose(np.asarray(sr), np.asarray(sr_ref), atol=1e-5)
    # votes compared against cascade_votes on the pipeline's OWN SR output,
    # so int8 quantization bins can't flip on ulp-level SR differences
    want_cls, want_conf = make_cascade_votes(qt, PATCH, STRIDE, 0.5)(
        jnp.asarray(np.asarray(sr)))
    np.testing.assert_array_equal(np.asarray(cls), np.asarray(want_cls))
    np.testing.assert_allclose(np.asarray(conf), np.asarray(want_conf),
                               atol=1e-6)


def test_escalation_count_ceils_not_rounds(monkeypatch):
    """K = ceil(N * frac): at the certified frac=0.28125 and a served batch
    of 16, round() would bankers-round 4.5 DOWN to 4 = an effective fraction
    0.25 below the certified minimum; ceil gives 5. Escalating more is always
    safe (the per-patch target is the certified path), escalating less
    silently voids the certification."""
    import tpusr.pipeline.cascade as casc

    n = 16
    imgs = (jnp.arange(n * 2 * 2 * 3, dtype=jnp.float32)
            .reshape(n, 2, 2, 3) / (n * 12.0))
    img_means = imgs.mean(axis=(1, 2, 3))
    # one patch per image (patch=stride=2); trunk: class 0 with strictly
    # increasing confidence so the 5 lowest-ranked images are 0..4
    p1 = 0.6 + 0.02 * jnp.arange(n)
    trunk_probs = jnp.stack([p1, 1.0 - p1], axis=-1)[:, None, :]

    def pp_apply(qtree, flat):
        means = flat.mean(axis=(1, 2, 3))
        idx = jnp.argmin(jnp.abs(means[:, None] - img_means[None, :]), axis=1)
        return jnp.tile(jnp.array([[0.1, 0.9]]), (idx.shape[0], 1))

    monkeypatch.setattr(casc, "quantize_input", lambda q, x: x)
    monkeypatch.setattr(casc, "shared_trunk_probs_int8",
                        lambda q, x, p, s: trunk_probs)
    monkeypatch.setattr(casc, "quantized_vgg16_apply", pp_apply)

    cls, _ = make_cascade_votes({}, patch=2, stride=2,
                                escalate_frac=0.28125)(imgs)
    cls = np.asarray(cls)
    # escalated rows flip to the per-patch class 1; exactly ceil(4.5)=5 of
    # them, and they are the 5 lowest-confidence images
    assert cls.sum() == 5, cls
    np.testing.assert_array_equal(cls[:5], 1)
    np.testing.assert_array_equal(cls[5:], 0)


@pytest.mark.slow  # ~155s: compiles the full serving pipeline graph on CPU
def test_serving_pipeline_bf16_cascade_mode(setup):
    """The SHIPPED serving default (sr_mode='bf16' + clf_mode='cascade_int8',
    GATE_r05.json / bench.py DEFAULT_MODE / `tpusr serve`): the SR output is
    the bf16 fused-tail path and the votes match cascade_votes applied to
    that same SR output, exactly as in the f32 twin above."""
    from tpusr.models import EDSR
    from tpusr.models.edsr_fast import make_fused_sr_apply
    from tpusr.models.layers import pixel_shuffle
    from tpusr.pipeline import make_serving_pipeline

    qtree, _ = setup
    rng = np.random.default_rng(7)
    sr_model = EDSR(scale_factor=2, num_res_blocks=1)
    sv = sr_model.init(jax.random.PRNGKey(5),
                       jnp.zeros((1, 32, 32, 3)))["params"]
    clf_model = VGG16Classifier(num_classes=2, dropout_rate=0.0)
    cv = clf_model.init(jax.random.PRNGKey(6),
                        jnp.zeros((1, PATCH, PATCH, 3)))["params"]
    calib = rng.random((4, PATCH, PATCH, 3)).astype(np.float32)

    pipe = make_serving_pipeline(
        sv, cv, lr_hw=(32, 32), scale=2, patch=PATCH, stride=STRIDE,
        sr_mode="bf16", clf_mode="cascade_int8", calib_patches=calib,
        cascade_escalate_frac=0.28125, cascade_escalate_score="vote_frac")
    lr = rng.random((4, 32, 32, 3)).astype(np.float32)
    sr, cls, conf = pipe(lr)

    from tpusr.models.quant import calibrate_vgg16 as _cal
    qt = quantize_vgg16(cv, _cal(cv, calib))
    poly_fn, r = make_fused_sr_apply(sv, 2, dtype=jnp.bfloat16)
    sr_ref = pixel_shuffle(poly_fn(jnp.asarray(lr)), r).astype(jnp.float32)
    # bf16 twin of the f32 test's ulp note: one jit graph vs two-call
    # composition — allow a few bf16 quanta
    np.testing.assert_allclose(np.asarray(sr), np.asarray(sr_ref), atol=3e-2)
    want_cls, want_conf = make_cascade_votes(
        qt, PATCH, STRIDE, 0.28125, escalate_score="vote_frac")(
        jnp.asarray(np.asarray(sr)))
    np.testing.assert_array_equal(np.asarray(cls), np.asarray(want_cls))
    np.testing.assert_allclose(np.asarray(conf), np.asarray(want_conf),
                               atol=1e-6)


def test_guard_triggers_on_trunk_collapse(monkeypatch):
    """The measured seed-8 failure shape: the trunk votes one class on
    EVERY image with high confidence and high patch agreement, while the
    per-patch path disagrees. The canary (escalated trunk-vs-per-patch
    disagreement) reads 1.0 >= threshold, so the WHOLE batch must serve
    per-patch votes — including images the escalation never touched."""
    import tpusr.pipeline.cascade as casc

    n = 8
    imgs = (jnp.arange(n * 2 * 2 * 3, dtype=jnp.float32)
            .reshape(n, 2, 2, 3) / (n * 12.0))
    img_means = imgs.mean(axis=(1, 2, 3))
    # collapsed trunk: class 0 everywhere, confident, unanimous patches
    trunk_probs = jnp.tile(jnp.array([[0.9, 0.1]]), (n, 1))[:, None, :]

    def pp_apply(qtree, flat):
        means = flat.mean(axis=(1, 2, 3))
        idx = jnp.argmin(jnp.abs(means[:, None] - img_means[None, :]), axis=1)
        return jnp.tile(jnp.array([[0.2, 0.8]]), (idx.shape[0], 1))

    monkeypatch.setattr(casc, "quantize_input", lambda q, x: x)
    monkeypatch.setattr(casc, "shared_trunk_probs_int8",
                        lambda q, x, p, s: trunk_probs)
    monkeypatch.setattr(casc, "quantized_vgg16_apply", pp_apply)

    # unguarded: only the escalated 2 images flip to per-patch class 1
    cls_u, _ = make_cascade_votes({}, patch=2, stride=2, escalate_frac=0.25,
                                  guard_threshold=None)(imgs)
    assert np.asarray(cls_u).sum() == 2
    # guarded: canary = 2/2 disagreement = 1.0 >= 0.6 -> whole batch
    # re-served per-patch (all class 1)
    cls_g, conf_g = make_cascade_votes({}, patch=2, stride=2,
                                       escalate_frac=0.25,
                                       guard_threshold=0.6)(imgs)
    np.testing.assert_array_equal(np.asarray(cls_g), 1)
    np.testing.assert_allclose(np.asarray(conf_g), 0.8, atol=1e-6)


def test_guard_stays_silent_on_healthy_trunk(monkeypatch):
    """When trunk and per-patch agree on the escalated subset, the guarded
    cascade must be bit-identical to the unguarded one (the healthy path
    costs one scalar compare)."""
    import tpusr.pipeline.cascade as casc

    n = 8
    imgs = (jnp.arange(n * 2 * 2 * 3, dtype=jnp.float32)
            .reshape(n, 2, 2, 3) / (n * 12.0))
    img_means = imgs.mean(axis=(1, 2, 3))
    p1 = 0.55 + 0.04 * jnp.arange(n)
    trunk_probs = jnp.stack([1.0 - p1, p1], axis=-1)[:, None, :]  # class 1

    def pp_apply(qtree, flat):  # agrees with the trunk everywhere
        means = flat.mean(axis=(1, 2, 3))
        idx = jnp.argmin(jnp.abs(means[:, None] - img_means[None, :]), axis=1)
        return jnp.stack([1.0 - p1[idx], p1[idx]], axis=-1)

    monkeypatch.setattr(casc, "quantize_input", lambda q, x: x)
    monkeypatch.setattr(casc, "shared_trunk_probs_int8",
                        lambda q, x, p, s: trunk_probs)
    monkeypatch.setattr(casc, "quantized_vgg16_apply", pp_apply)

    cls_u, conf_u = make_cascade_votes({}, patch=2, stride=2,
                                       escalate_frac=0.25)(imgs)
    cls_g, conf_g = make_cascade_votes({}, patch=2, stride=2,
                                       escalate_frac=0.25,
                                       guard_threshold=0.6)(imgs)
    np.testing.assert_array_equal(np.asarray(cls_g), np.asarray(cls_u))
    np.testing.assert_allclose(np.asarray(conf_g), np.asarray(conf_u),
                               atol=1e-7)

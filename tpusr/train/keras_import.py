"""Keras ``.h5`` checkpoint importers — interop with the reference's saved models.

The reference persists full Keras models (``SRCNN_{ts}.h5``,
``EDSR_x{s}_{ts}.h5``, ``ESRGAN_generator_x{s}_{ts}.h5``, ``VGG16_{ts}.h5``;
SURVEY.md §5 checkpoint row). These importers load their weights into the
matching tpusr flax parameter trees so fp32 logit-parity against the reference
is testable (BASELINE: identical classifier logits, PSNR/SSIM within 1e-3).

Keras Conv2D kernels are (kh, kw, in, out) and Dense kernels (in, out) — the
same layouts flax uses, so copies are direct. SRCNN/EDSR use Keras auto-named
layers, so those map by layer order; ESRGAN and VGG use explicit layer names.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _weights_group(f):
    return f["model_weights"] if "model_weights" in f else f


def _layer_names(f):
    g = _weights_group(f)
    names = g.attrs.get("layer_names")
    if names is not None:
        return [n.decode() if isinstance(n, bytes) else str(n) for n in names]
    return list(g.keys())


def keras_layer_weights(path: str):
    """Ordered list of (layer_name, [arrays...]) for layers that have weights."""
    import h5py

    out = []
    with h5py.File(path, "r") as f:
        g = _weights_group(f)
        for lname in _layer_names(f):
            if lname not in g:
                continue
            grp = g[lname]
            wnames = grp.attrs.get("weight_names", [])
            wnames = [w.decode() if isinstance(w, bytes) else str(w) for w in wnames]
            if not wnames:
                continue
            arrays = [np.asarray(grp[w]) for w in wnames]
            out.append((lname, list(zip(wnames, arrays))))
    return out


def _leaf(wname: str) -> str:
    """'conv2d/kernel:0' (keras 2) or 'seq/conv2d/kernel' (keras 3) -> 'kernel'."""
    return wname.split("/")[-1].split(":")[0]


def _layer_of(wname: str) -> str:
    parts = wname.split("/")
    return parts[-2] if len(parts) >= 2 else ""


def _conv_dense_pairs(path):
    """(kernel, bias) tuples for conv/dense layers, in saved layer order."""
    pairs = []
    for _lname, ws in keras_layer_weights(path):
        kernel = bias = None
        for wname, arr in ws:
            if _leaf(wname) == "kernel":
                kernel = arr
            elif _leaf(wname) == "bias":
                bias = arr
        if kernel is not None:
            pairs.append((kernel, bias))
    return pairs


def _set(tree, path, kernel, bias):
    node = tree
    for k in path[:-1]:
        node = node[k]
    leaf = path[-1]
    want = node[leaf]["kernel"].shape
    if tuple(kernel.shape) != tuple(want):
        raise ValueError(f"shape mismatch at {'/'.join(path)}: "
                         f"h5 {kernel.shape} vs flax {want}")
    node[leaf] = {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}


def _mutable(tree):
    if isinstance(tree, dict):
        return {k: _mutable(v) for k, v in tree.items()}
    return tree


def import_srcnn(params: dict, h5_path: str) -> dict:
    """SRCNN: 3 convs in order -> conv1/conv2/conv3 (SRCNN_model.py:45-53)."""
    pairs = _conv_dense_pairs(h5_path)
    if len(pairs) != 3:
        raise ValueError(f"expected 3 conv layers, found {len(pairs)}")
    out = _mutable(params)
    for i, (k, b) in enumerate(pairs, 1):
        _set(out, (f"conv{i}",), k, b)
    return out


def import_edsr(params: dict, h5_path: str, num_res_blocks: int = 16,
                scale_factor: int = 2) -> dict:
    """EDSR: convs in creation order — head, (res conv1, conv2) x N, body,
    upsample conv(s), tail (EDSR_model.py:96-125)."""
    pairs = _conv_dense_pairs(h5_path)
    n_up = 2 if scale_factor == 4 else 1
    expected = 1 + 2 * num_res_blocks + 1 + n_up + 1
    if len(pairs) != expected:
        raise ValueError(f"expected {expected} conv layers, found {len(pairs)}")
    out = _mutable(params)
    it = iter(pairs)
    _set(out, ("head",), *next(it))
    for i in range(num_res_blocks):
        k, b = next(it)
        _set(out, (f"res{i}", "conv1"), k, b)
        k, b = next(it)
        _set(out, (f"res{i}", "conv2"), k, b)
    _set(out, ("body",), *next(it))
    for i in range(n_up):
        _set(out, (f"up{i}",), *next(it))
    _set(out, ("tail",), *next(it))
    return out


_ESRGAN_ATTN = {"self_attention_trunk": "self_attention_trunk",
                "self_attention_upsample_0": "self_attention_upsample_0"}


def _count_kernels(tree) -> int:
    """Number of {kernel, bias} conv/dense nodes in a params tree."""
    if not isinstance(tree, dict):
        return 0
    return (1 if "kernel" in tree else 0) + sum(
        _count_kernels(v) for k, v in tree.items() if k != "kernel")


def import_esrgan_generator(params: dict, h5_path: str) -> dict:
    """ESRGAN generator: explicit layer names (ESRGAN_model.py:303-345).
    initial_conv, rrdb_{i}_dense{j}_conv{k}, trunk_conv, self-attention f/g/h/v,
    upsample_{i}_conv, final_conv1/final_conv2. Raises if any flax conv is
    left unfilled (an .h5 with unrecognized layer names must not silently
    keep random init — the logit-parity contract)."""
    out = _mutable(params)
    filled = []

    def _fill(o, path, k, b):
        _set(o, path, k, b)
        filled.append(path)

    for lname, ws in keras_layer_weights(h5_path):
        arrays = {_leaf(w): a for w, a in ws}
        if lname in _ESRGAN_ATTN:
            # SelfAttention stores its four sub-convs' weights in one layer
            # group, named <layer>_{f,g,h,v}/kernel
            sub = {}
            for wname, arr in ws:
                tag = _layer_of(wname).rsplit("_", 1)[-1]  # f/g/h/v
                sub.setdefault(tag, {})[_leaf(wname)] = arr
            for tag in ("f", "g", "h", "v"):
                if tag in sub:
                    _fill(out, (lname, tag), sub[tag]["kernel"], sub[tag]["bias"])
            continue
        if "kernel" not in arrays:
            continue
        k, b = arrays["kernel"], arrays.get("bias")
        if lname == "initial_conv":
            _fill(out, ("initial_conv",), k, b)
        elif lname == "trunk_conv":
            _fill(out, ("trunk_conv",), k, b)
        elif lname.startswith("rrdb_"):
            # rrdb_{i}_dense{j}_conv{k}
            stem, convk = lname.rsplit("_", 1)
            block, densej = stem.rsplit("_", 1)
            _fill(out, (block, densej, convk), k, b)
        elif lname.startswith("upsample_") and lname.endswith("_conv"):
            _fill(out, (lname,), k, b)
        elif lname in ("final_conv1", "final_conv2"):
            _fill(out, (lname,), k, b)
    expected = _count_kernels(params)
    if len(filled) != expected:
        raise ValueError(
            f"import_esrgan_generator: matched {len(filled)} of {expected} "
            f"conv layers in {h5_path} — unrecognized layer names would "
            f"leave random-initialized params")
    return out


_DISC_MAP = {f"disc_conv{i}": f"conv{i}" for i in range(1, 7)}
_DISC_MAP.update({"disc_dense1": "dense1", "disc_output": "output"})


def import_esrgan_discriminator(params: dict, spectral: dict, h5_path: str):
    """ESRGAN discriminator incl. spectral-norm state: the reference saves it
    as ``ESRGAN_discriminator_x{s}_{ts}.h5`` (ESRGAN_model.py:989-993) and
    reloads it to resume adversarial training (:143-149). Each conv/dense is
    wrapped in SpectralNormalization; saved weight paths keep the inner layer
    names (disc_conv{1..6}, disc_dense1, disc_output) plus the wrapper's
    power-iteration vector ('vector_u' in keras 3, 'sn_u' in
    tensorflow_addons). Returns (params, spectral) trees for GANState.
    """
    out = _mutable(params)
    spec = _mutable(spectral)
    seen = set()
    for _lname, ws in keras_layer_weights(h5_path):
        kernel = bias = u = inner = None
        for wname, arr in ws:
            leaf = _leaf(wname)
            if leaf == "kernel":
                kernel, inner = arr, _layer_of(wname)
            elif leaf == "bias":
                bias = arr
            elif leaf in ("vector_u", "sn_u", "u"):
                u = arr
        if kernel is None or inner not in _DISC_MAP:
            continue
        tgt = _DISC_MAP[inner]
        _set(out, (tgt,), kernel, bias)
        if u is not None:
            want = tuple(np.asarray(spec[tgt]["u"]).shape)
            if tuple(u.shape) != want:
                raise ValueError(f"u-vector shape mismatch at {tgt}: "
                                 f"h5 {u.shape} vs flax {want}")
            spec[tgt] = {"u": jnp.asarray(u)}
        seen.add(tgt)
    missing = set(_DISC_MAP.values()) - seen
    if missing:
        raise ValueError(
            f"discriminator import incomplete; missing layers {sorted(missing)}")
    return out, spec


def import_vgg16_classifier(params: dict, h5_path: str) -> dict:
    """FineTunedVGG16: vgg16 backbone (block{i}_conv{j}) + head Dense 256 +
    Dense num_classes named 'predictions' (VGG16_model.py:84-97). The keras
    model nests the VGG16 base as a sub-model layer."""
    out = _mutable(params)
    dense_seen = []
    for lname, ws in keras_layer_weights(h5_path):
        for wname, arr in ws:
            leaf = _leaf(wname)
            layer = _layer_of(wname)
            if leaf != "kernel":
                continue
            bias = next((a for w2, a in ws
                         if _layer_of(w2) == layer and _leaf(w2) == "bias"),
                        None)
            if bias is None:
                raise ValueError(
                    f"import_vgg16_classifier: layer {layer!r} in {h5_path} "
                    f"has a kernel but no bias")
            if layer.startswith("block") and "_conv" in layer:
                _set(out, ("vgg16", layer), arr, bias)
            elif layer == "predictions":
                _set(out, ("predictions",), arr, bias)
            elif arr.ndim == 2:
                dense_seen.append((layer, arr, bias))
    # the remaining 2-D kernel is the 256-unit head (keras auto-name 'dense')
    fc1_shape = tuple(np.asarray(out["fc1"]["kernel"]).shape)
    for _layer, k, b in dense_seen:
        if k.shape == fc1_shape:
            _set(out, ("fc1",), k, b)
            break
    else:
        raise ValueError(
            f"import_vgg16_classifier: no dense kernel of shape {fc1_shape} "
            f"(the 256-unit head) found in {h5_path} — candidates: "
            f"{[(n, a.shape) for n, a, _ in dense_seen]}; a silently skipped "
            f"head would break logit parity")
    return out

"""Offline ImageNet-weights provisioning for VGG16/VGG19.

The reference auto-downloads Keras ImageNet weights
(``defect_detection_models/VGG16_model.py:66-72`` for the classifier base,
``deep_learning_models/ESRGAN_model.py:379-399`` for the VGG19 perceptual
extractor). This environment has no egress, so provisioning is a documented
offline step:

1. On a connected machine, download the official Keras releases (notop):
   - vgg16: https://storage.googleapis.com/tensorflow/keras-applications/vgg16/vgg16_weights_tf_dim_ordering_tf_kernels_notop.h5
   - vgg19: https://storage.googleapis.com/tensorflow/keras-applications/vgg19/vgg19_weights_tf_dim_ordering_tf_kernels_notop.h5
2. Copy the file(s) next to the repo and either pass the .h5 directly
   (``FineTunedVGG16.setup_model(imagenet_weights_path=...)``,
   ``ESRGAN.setup_model(vgg19_weights_path=...)``, CLI ``--vgg19-weights``)
   or convert once to a validated .npz with this tool:

       python -m tpusr.tools.imagenet_weights --arch vgg16 \
           --src vgg16_weights_tf_dim_ordering_tf_kernels_notop.h5 \
           --out weights/vgg16_imagenet.npz

Both entry points accept the .npz as well. Fidelity tests gated on
``TPUSR_IMAGENET_VGG16_H5`` / ``TPUSR_IMAGENET_VGG19_H5`` run when the files
are present (tests/test_imagenet_weights.py).
"""

from __future__ import annotations

import argparse

import numpy as np

# expected conv layout: (block, convs-in-block, filters) — mirrors
# tpusr.models.vgg._VGG16_CFG/_VGG19_CFG, duplicated here so validation does
# not need to build a model.
_CFGS = {
    "vgg16": ((1, 2, 64), (2, 2, 128), (3, 3, 256), (4, 3, 512), (5, 3, 512)),
    "vgg19": ((1, 2, 64), (2, 2, 128), (3, 4, 256), (4, 4, 512), (5, 4, 512)),
}


def expected_shapes(arch: str) -> dict[str, tuple]:
    cfg = _CFGS[arch]
    shapes = {}
    in_ch = 3
    for block, n_convs, filters in cfg:
        for ci in range(1, n_convs + 1):
            shapes[f"block{block}_conv{ci}"] = (3, 3, in_ch, filters)
            in_ch = filters
    return shapes


def h5_backbone_arrays(h5_path: str) -> dict[str, dict[str, np.ndarray]]:
    """{layer: {'kernel': ..., 'bias': ...}} from a Keras VGG .h5."""
    from tpusr.train.keras_import import keras_layer_weights, _layer_of, _leaf

    out: dict[str, dict[str, np.ndarray]] = {}
    for _lname, ws in keras_layer_weights(h5_path):
        for wname, arr in ws:
            layer = _layer_of(wname) or _lname
            if layer.startswith("block") and "_conv" in layer:
                out.setdefault(layer, {})[_leaf(wname)] = np.asarray(arr)
    return out


def validate(arch: str, layers: dict[str, dict[str, np.ndarray]]) -> None:
    want = expected_shapes(arch)
    missing = sorted(set(want) - set(layers))
    if missing:
        raise ValueError(f"{arch}: missing conv layers {missing}")
    for name, shape in want.items():
        got = tuple(layers[name]["kernel"].shape)
        if got != shape:
            raise ValueError(f"{arch}/{name}: kernel shape {got}, want {shape}")
        if tuple(layers[name]["bias"].shape) != (shape[-1],):
            raise ValueError(f"{arch}/{name}: bad bias shape")


def convert(arch: str, src_h5: str, out_npz: str) -> None:
    """Validate a Keras VGG .h5 and save a flat .npz weight bundle."""
    layers = h5_backbone_arrays(src_h5)
    validate(arch, layers)
    flat = {"__arch__": np.asarray(arch)}
    for name, ws in layers.items():
        flat[f"{name}/kernel"] = ws["kernel"]
        flat[f"{name}/bias"] = ws["bias"]
    import os

    os.makedirs(os.path.dirname(os.path.abspath(out_npz)) or ".", exist_ok=True)
    np.savez(out_npz, **flat)
    print(f"validated {arch} ({len(layers)} conv layers) -> {out_npz}")


def load_npz_backbone(params: dict, npz_path: str, backbone_key: str) -> dict:
    """Import a converted .npz bundle into a flax params tree (same contract
    as tpusr.models.vgg.load_keras_h5_weights)."""
    import jax.numpy as jnp

    data = np.load(npz_path)
    out = {k: dict(v) if isinstance(v, dict) else v for k, v in params.items()}
    bb = {k: dict(v) for k, v in out[backbone_key].items()}
    for key in data.files:
        if key == "__arch__" or "/" not in key:
            continue
        layer, leaf = key.split("/", 1)
        if layer not in bb:
            raise ValueError(f"{npz_path}: unexpected layer {layer} for "
                             f"backbone {backbone_key}")
        want = tuple(np.asarray(bb[layer][leaf]).shape)
        if tuple(data[key].shape) != want:
            raise ValueError(f"{npz_path}:{key}: shape {data[key].shape}, "
                             f"flax wants {want}")
        bb[layer] = {**bb[layer], leaf: jnp.asarray(data[key])}
    out[backbone_key] = bb
    return out


def load_backbone_weights(params: dict, path: str, backbone_key: str) -> dict:
    """Dispatch .h5 (Keras) / .npz (converted) backbone weight imports."""
    if path.endswith(".npz"):
        return load_npz_backbone(params, path, backbone_key)
    from tpusr.models.vgg import load_keras_h5_weights

    return load_keras_h5_weights(params, path, backbone_key)


def load_manifest() -> dict:
    """The checked-in manifest of the official weight releases (filenames,
    URLs, hashes, expected param counts)."""
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "imagenet_manifest.json")
    with open(path) as f:
        return json.load(f)


def file_hashes(path: str) -> dict[str, str]:
    import hashlib

    md5, sha = hashlib.md5(), hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            md5.update(chunk)
            sha.update(chunk)
    return {"md5": md5.hexdigest(), "sha256": sha.hexdigest()}


def verify_official(path: str, key: str, record_sha256: bool = False) -> dict:
    """Check a provisioned file against the manifest. md5 must match the
    keras-applications file_hash; sha256 is compared when recorded, or
    written into the manifest on first provisioning with record_sha256."""
    import json
    import os

    manifest = load_manifest()
    if key not in manifest:
        raise KeyError(f"unknown manifest key {key!r}; have "
                       f"{[k for k in manifest if not k.startswith('_')]}")
    entry = manifest[key]
    got = file_hashes(path)
    if got["md5"] != entry["md5"]:
        raise ValueError(
            f"{path}: md5 {got['md5']} does not match the official "
            f"{entry['filename']} ({entry['md5']}) — wrong or corrupt file")
    if entry.get("sha256"):
        if got["sha256"] != entry["sha256"]:
            raise ValueError(f"{path}: sha256 mismatch vs recorded manifest")
    elif record_sha256:
        entry["sha256"] = got["sha256"]
        mpath = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "imagenet_manifest.json")
        with open(mpath, "w") as f:
            json.dump(manifest, f, indent=2)
        print(f"recorded sha256 {got['sha256']} for {key}")
    return got


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Validate/convert Keras VGG ImageNet weights for tpusr")
    p.add_argument("--arch", choices=("vgg16", "vgg19"), required=True)
    p.add_argument("--src", required=True, help="Keras .h5 (notop) weight file")
    p.add_argument("--out", default=None,
                   help=".npz output; omit to validate only")
    p.add_argument("--verify-official", action="store_true",
                   help="check --src md5/sha256 against the checked-in "
                        "manifest (official releases only)")
    p.add_argument("--record-sha256", action="store_true",
                   help="with --verify-official: record the sha256 into the "
                        "manifest on first provisioning")
    args = p.parse_args(argv)
    if args.verify_official:
        key = f"{args.arch}_notop"
        got = verify_official(args.src, key, record_sha256=args.record_sha256)
        print(f"{args.src}: md5 OK ({got['md5']}), sha256 {got['sha256']}")
    if args.out:
        convert(args.arch, args.src, args.out)
    else:
        validate(args.arch, h5_backbone_arrays(args.src))
        print(f"{args.src}: valid {args.arch} backbone")


if __name__ == "__main__":
    main()

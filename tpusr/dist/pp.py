"""Pipeline parallelism (PP): the EDSR res-block chain staged over a mesh axis.

Completes the parallelism matrix next to DP (``dist/mesh.py``), TP
(``dist/tp.py``) and the SP analog (``dist/spatial.py``). The reference has no
distributed execution at all (SURVEY §2 parallelism inventory); PP here is the
TPU-native GPipe-style schedule expressed the JAX way:

- the mesh gets a ``'stage'`` axis; stage ``s`` holds res blocks
  ``[s*k, (s+1)*k)`` of the chain (``EDSR_model.py:96-110`` — the blocks are
  structurally identical, so per-stage params are one stacked ``(k, ...)``
  tree sharded ``P('stage')``);
- the batch is split into M microbatches; a ``jax.lax.scan`` runs the classic
  ``M + S - 1``-step schedule inside one ``shard_map``: each step applies the
  local stage to the activation in flight and hands it to the right
  neighbor with ``jax.lax.ppermute`` (one ICI hop — no host involvement, no
  send/recv runtime; the "communication backend" is XLA collectives, as
  everywhere else in ``tpusr.dist``);
- the cheap single convs outside the chain (head / body+skip / upsample tail,
  ~6 of the 36 convs) run on the full batch outside the pipelined region,
  data-parallel over the mesh when a ``data_axis`` is given — only the 2x16
  res-block convs carry the pipeline's bubble overhead;
- everything is differentiable: ``ppermute``/``psum``/``dynamic_slice`` have
  transpose rules, so ``jax.grad`` through the pipelined forward yields the
  reverse schedule automatically — ``pp_train_step`` below is a full PP
  training step whose loss/grads match the unsharded step exactly
  (tests/test_pp.py).

Like TP, this is capability scaffolding beyond reference parity: at the
reference's model sizes (<=1.4M params) DP alone saturates a slice, but the
schedule is the real thing and certified by ``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpusr.models.edsr_fast import _conv
from tpusr.models.layers import pixel_shuffle


def stack_res_params(params: dict, n_stages: int):
    """Split an EDSR params tree into (stacked res-chain tree, rest).

    The stacked tree has leading dims ``(n_stages, blocks_per_stage, ...)`` on
    every leaf — ready to shard ``P('stage')``. ``rest`` keeps head/body/up/tail
    (replicated)."""
    res_names = sorted((k for k in params if k.startswith("res")),
                       key=lambda s: int(s[3:]))
    n_blocks = len(res_names)
    if n_blocks == 0 or n_blocks % n_stages:
        raise ValueError(
            f"{n_blocks} res blocks do not split into {n_stages} stages")
    k = n_blocks // n_stages
    per_block = [params[name] for name in res_names]
    stacked = jax.tree.map(lambda *leaves: jnp.stack(leaves), *per_block)
    stacked = jax.tree.map(
        lambda a: a.reshape((n_stages, k) + a.shape[1:]), stacked)
    rest = {name: params[name] for name in params
            if not name.startswith("res")}
    return stacked, rest


def _apply_stage(stage_params: dict, y: jnp.ndarray,
                 res_scaling: float) -> jnp.ndarray:
    """Apply this stage's (k, ...) stacked res blocks to y (a scan over k)."""

    def block(carry, p):
        t = jax.nn.relu(_conv(p["conv1"], carry))
        t = _conv(p["conv2"], t)
        return carry + res_scaling * t, None

    y, _ = jax.lax.scan(block, y, stage_params)
    return y


def make_pp_edsr_apply(model, mesh: Mesh, n_micro: int,
                       stage_axis: str = "stage",
                       data_axis: str | None = None):
    """Build ``apply(params, x) -> sr`` running the EDSR forward with the
    res chain pipelined over ``mesh``'s ``stage_axis``.

    ``model`` is an ``EDSR`` instance (its config — block count, filters,
    res_scaling, scale_factor — fixes the schedule); ``params`` is its
    ordinary single-device params tree. ``x`` is the full (N, h, w, c) batch;
    it is split into ``n_micro`` microbatches (``n_micro >= n_stages`` keeps
    the bubble fraction at ``(S-1)/(M+S-1)``). With ``data_axis``, each
    microbatch is additionally sharded over that axis (DP x PP on a 2-D mesh).

    Exact ``model.apply`` semantics — same convs, same order, same clip
    (tests/test_pp.py asserts equality)."""
    n_stages = mesh.shape[stage_axis]
    res_scaling = model.res_scaling
    scale = model.scale_factor
    up_names = ["up0", "up1"] if scale == 4 else ["up0"]
    r_steps = [2, 2] if scale == 4 else [scale]

    mb_spec = P(None, data_axis)  # (M, mb, h, w, f): mb over data, M replicated
    m_total = n_micro
    n_steps = m_total + n_stages - 1

    def _pipeline_local(res_p, h0_loc):
        # res_p: (1, k, ...) this stage's slice; h0_loc: (M, mb_loc, ...)
        res_p = jax.tree.map(lambda a: a[0], res_p)
        s = jax.lax.axis_index(stage_axis)
        zero = jnp.zeros_like(h0_loc[0])

        def step(carry, t):
            y, out = carry
            # stage 0 injects microbatch t (clipped index keeps the
            # gather in bounds during the drain steps; the value is
            # masked off by `is_first` anyway)
            inj = jax.lax.dynamic_index_in_dim(
                h0_loc, jnp.clip(t, 0, m_total - 1), 0, keepdims=False)
            is_first = (s == 0) & (t < m_total)
            y = jnp.where(is_first, inj, y)
            y = _apply_stage(res_p, y, res_scaling)
            # last stage retires microbatch t-(S-1) into the output slot
            oidx = t - (n_stages - 1)
            oc = jnp.clip(oidx, 0, m_total - 1)
            valid = (s == n_stages - 1) & (oidx >= 0)
            cur = jax.lax.dynamic_index_in_dim(out, oc, 0, keepdims=False)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(valid, y, cur), oc, 0)
            # hand the activation to the next stage (one ICI hop)
            if n_stages > 1:
                y = jax.lax.ppermute(
                    y, stage_axis,
                    [(i, (i + 1) % n_stages) for i in range(n_stages)])
            return (y, out), None

        out0 = jnp.zeros_like(h0_loc)
        # the carry becomes stage-varying inside the scan (res_p and
        # axis_index vary per stage); mark the initial values accordingly
        # (pcast is the current spelling, pvary the pre-rename one; oldest
        # shard_map versions need no annotation at all)
        if hasattr(jax.lax, "pcast"):
            zero, out0 = jax.lax.pcast((zero, out0), (stage_axis,),
                                       to="varying")
        elif hasattr(jax.lax, "pvary"):
            zero, out0 = jax.lax.pvary((zero, out0), (stage_axis,))
        (_, out), _ = jax.lax.scan(step, (zero, out0), jnp.arange(n_steps))
        # non-final stages hold zeros; the psum replicates the final
        # stage's buffer everywhere (out_specs declares mb_spec)
        return jax.lax.psum(out, stage_axis)

    pipeline = jax.shard_map(_pipeline_local, mesh=mesh,
                             in_specs=(P(stage_axis), mb_spec),
                             out_specs=mb_spec)

    def apply(params, x):
        n = x.shape[0]
        if n % n_micro:
            raise ValueError(f"batch {n} not divisible by n_micro={n_micro}")
        mb = n // n_micro
        if data_axis is not None and mb % mesh.shape[data_axis]:
            raise ValueError(
                f"microbatch size {mb} not divisible by mesh axis "
                f"'{data_axis}' size {mesh.shape[data_axis]}")
        stacked_res, rest = stack_res_params(params, n_stages)

        xm = x.reshape((n_micro, mb) + x.shape[1:])
        h0 = jax.vmap(lambda z: _conv(rest["head"], z))(xm)
        y = pipeline(stacked_res, h0)

        def tail(y_mb, h0_mb):
            z = _conv(rest["body"], y_mb) + h0_mb
            for name, rr in zip(up_names, r_steps):
                z = pixel_shuffle(_conv(rest[name], z), rr)
            z = _conv(rest["tail"], z)
            return jnp.clip(z, 0.0, 1.0)

        sr = jax.vmap(tail)(y, h0)
        return sr.reshape((n,) + sr.shape[2:])

    return apply


def make_pp_train_step(model, mesh: Mesh, n_micro: int, learning_rate=1e-4,
                       stage_axis: str = "stage",
                       data_axis: str | None = None):
    """One full PP training step: MSE loss through the pipelined forward,
    grads via jax.grad (the reverse pipeline schedule falls out of the
    ppermute/psum transposes), SGD update. Returns
    ``step(params, x, y) -> (params, loss)`` (jit it once; params stay in the
    ordinary single-device tree layout)."""
    apply = make_pp_edsr_apply(model, mesh, n_micro, stage_axis, data_axis)

    def step(params, x, y):
        def loss_fn(p):
            pred = apply(p, x)
            return jnp.mean((pred - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params = jax.tree.map(lambda p, g: p - learning_rate * g,
                              params, grads)
        return params, loss

    return step


def make_pp_mesh(n_stages: int, n_data: int = 1,
                 stage_axis: str = "stage") -> Mesh:
    """A ('data', 'stage') mesh for DP x PP (or 1-D ('stage',) when
    n_data == 1)."""
    devs = jax.devices()[: n_data * n_stages]
    if len(devs) < n_data * n_stages:
        raise ValueError(
            f"need {n_data * n_stages} devices, have {len(jax.devices())}")
    if n_data == 1:
        return Mesh(np.array(devs), (stage_axis,))
    return Mesh(np.array(devs).reshape(n_data, n_stages),
                ("data", stage_axis))

"""Pallas TPU kernels for fusion-unfriendly hot ops.

`capsule_mask_render`: the planner renders (T+1) x N robot masks per CEM
iteration (planning/rollout.py). The jnp formulation materializes
(masks, segments, h, w) distance/radius/hit intermediates in HBM
(~4 arrays x M x 4 x h x w); this kernel keeps the entire per-mask
computation in VMEM — one program per mask computes the 4-segment union
in registers and writes the (h, w) mask once. Inputs are the projected
segment parameters (from the cheap jnp projection in
robot/mask_renderer.py).

Falls back to interpret mode off-TPU so tests run hermetically on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_SEGS = 4


BLOCK_MASKS = 16  # masks per program: amortizes launch overhead in VMEM


def _render_kernel(seg_ref, out_ref):
    """seg_ref (SMEM): (B, NUM_SEGS, 6) [au, av, bu, bv, ra, rb] in pixel
    space; out_ref (VMEM): (B, H, W) float32 masks. One program renders B
    masks; the (H, W) distance fields never leave VMEM."""
    B, H, W = out_ref.shape
    py = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).astype(jnp.float32) + 0.5
    px = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).astype(jnp.float32) + 0.5
    for b in range(B):
        acc = jnp.zeros((H, W), jnp.float32)
        for s in range(NUM_SEGS):
            au = seg_ref[b, s, 0]
            av = seg_ref[b, s, 1]
            bu = seg_ref[b, s, 2]
            bv = seg_ref[b, s, 3]
            ra = seg_ref[b, s, 4]
            rb = seg_ref[b, s, 5]
            dx = bu - au
            dy = bv - av
            seg_len2 = dx * dx + dy * dy + 1e-8
            t = jnp.clip(((px - au) * dx + (py - av) * dy) / seg_len2, 0.0, 1.0)
            cx = au + t * dx
            cy = av + t * dy
            dist2 = (px - cx) ** 2 + (py - cy) ** 2
            rad = ra * (1.0 - t) + rb * t
            acc = jnp.maximum(acc, jnp.where(dist2 <= rad * rad, 1.0, 0.0))
        out_ref[b] = acc


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def capsule_mask_render(segs, h: int, w: int, interpret: bool = False):
    """segs (M, NUM_SEGS, 6) -> masks (M, h, w) float32 in {0, 1}."""
    M = segs.shape[0]
    B = BLOCK_MASKS
    Mp = -(-M // B) * B
    if Mp != M:
        segs = jnp.pad(segs, [(0, Mp - M), (0, 0), (0, 0)])
    out = pl.pallas_call(
        _render_kernel,
        out_shape=jax.ShapeDtypeStruct((Mp, h, w), jnp.float32),
        grid=(Mp // B,),
        in_specs=[pl.BlockSpec((B, NUM_SEGS, 6), lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((B, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(segs)
    return out[:M]


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False

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

BLOCK_MASKS = 16  # masks per program: amortizes launch overhead in VMEM


def _render_kernel(seg_ref, out_ref):
    """seg_ref (SMEM): (B, S, 6) [au, av, bu, bv, ra, rb] in pixel
    space; out_ref (VMEM): (B, H, W) float32 masks. One program renders B
    masks; the (H, W) distance fields never leave VMEM."""
    B, H, W = out_ref.shape
    num_segs = seg_ref.shape[1]
    py = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).astype(jnp.float32) + 0.5
    px = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).astype(jnp.float32) + 0.5
    for b in range(B):
        acc = jnp.zeros((H, W), jnp.float32)
        for s in range(num_segs):
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
    """segs (M, S, 6) -> masks (M, h, w) float32 in {0, 1}."""
    M, num_segs = segs.shape[0], segs.shape[1]
    B = BLOCK_MASKS
    Mp = -(-M // B) * B
    if Mp != M:
        segs = jnp.pad(segs, [(0, Mp - M), (0, 0), (0, 0)])
    out = pl.pallas_call(
        _render_kernel,
        out_shape=jax.ShapeDtypeStruct((Mp, h, w), jnp.float32),
        grid=(Mp // B,),
        in_specs=[pl.BlockSpec((B, num_segs, 6), lambda i: (i, 0, 0),
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


# ---------------------------------------------------------------------------
# Fused ConvLSTM cell
#
# The 4-gate conv over cat(x, h) is 82% of the SVG step FLOPs (see
# RESULTS.md); XLA's conv lowering for the tiny 6x8 feature maps leaves
# ~30% of the MXU idle and round-trips the (B, H, W, 4C) gate tensor
# through HBM before the elementwise LSTM update. This kernel unrolls the
# k*k conv taps as dense matmuls over an f32 VMEM accumulator and applies
# sigmoid/tanh/state-update in-register: the gates never leave VMEM.
# Matches ops/lstm.py conv_lstm_cell numerics (gate order i,f,o,g —
# reference: src/prediction/models/lstm.py:132-148).


def _pack_lstm_weights(w, hct: int):
    """(k,k,Cin,4C) HWIO -> (ntiles, k*k, Cin, 4*hct) with gate-major
    [i|f|o|g] blocks of hct per tile so a lane slice yields one gate."""
    k1, k2, cin, c4 = w.shape
    c = c4 // 4
    w = w.reshape(k1 * k2, cin, 4, c)
    tiles = [
        w[:, :, :, i : i + hct].reshape(k1 * k2, cin, 4 * hct)
        for i in range(0, c, hct)
    ]
    return jnp.stack(tiles, 0)


def _pack_lstm_bias(b, hct: int):
    c = b.shape[0] // 4
    b = b.reshape(4, c)
    return jnp.stack(
        [b[:, i : i + hct].reshape(4 * hct) for i in range(0, c, hct)], 0
    )


def _conv_lstm_kernel(xh_ref, c_ref, w_ref, b_ref, h_out, c_out,
                      *, k: int, H: int, W: int):
    """One program: (Bt, H+2p, W+2p, Cin) x-h block, one hct gate tile.
    Unrolled taps keep every matmul on the MXU with an f32 accumulator."""
    Bt = xh_ref.shape[0]
    n4 = w_ref.shape[-1]
    hct = n4 // 4
    M = Bt * H * W
    acc = jnp.broadcast_to(b_ref[0, 0].astype(jnp.float32), (M, n4))
    for t in range(k * k):
        dy, dx = t // k, t % k
        xs = xh_ref[:, dy : dy + H, dx : dx + W, :]
        xs = xs.reshape(M, xh_ref.shape[-1])
        acc = acc + jnp.dot(
            xs, w_ref[0, t], preferred_element_type=jnp.float32
        )
    i = jax.nn.sigmoid(acc[:, 0:hct])
    f = jax.nn.sigmoid(acc[:, hct : 2 * hct])
    o = jax.nn.sigmoid(acc[:, 2 * hct : 3 * hct])
    g = jnp.tanh(acc[:, 3 * hct : 4 * hct])
    c_prev = c_ref[:].reshape(M, hct).astype(jnp.float32)
    c_new = f * c_prev + i * g
    h_new = o * jnp.tanh(c_new)
    dt = h_out.dtype
    h_out[:] = h_new.astype(dt).reshape(Bt, H, W, hct)
    c_out[:] = c_new.astype(dt).reshape(Bt, H, W, hct)


def _fused_cell_fwd(x, h, c, w, b, *, interpret: bool = False,
                    block_b: int = 4):
    """x (B,H,W,Cx), h/c (B,H,W,C) -> (h_new, c_new). Traceable.

    Grid is (channel-tile, batch-tile) with batch innermost so the weight
    block (the big operand) stays VMEM-resident across all batch steps.
    Mosaic requires lane-tiled block dims divisible by 128, so hidden
    channels tile at 128 (or a single full-C tile when C < 128 / not a
    multiple)."""
    B, H, W, _ = x.shape
    C = h.shape[-1]
    k = w.shape[0]
    p = k // 2
    hct = 128 if (C > 128 and C % 128 == 0) else C
    xh = jnp.concatenate([x, h.astype(x.dtype)], -1)
    xh = jnp.pad(xh, [(0, 0), (p, p), (p, p), (0, 0)])
    Bt = min(block_b, B)
    Bp = -(-B // Bt) * Bt
    if Bp != B:
        xh = jnp.pad(xh, [(0, Bp - B), (0, 0), (0, 0), (0, 0)])
        c = jnp.pad(c, [(0, Bp - B), (0, 0), (0, 0), (0, 0)])
    wp = _pack_lstm_weights(w.astype(x.dtype), hct)
    nh = C // hct
    # bias as (nh, 1, 4*hct): a (1, 1, lanes) block satisfies Mosaic's
    # block-shape divisibility rule (second-minor == full dim)
    bp = _pack_lstm_bias(b, hct).reshape(nh, 1, 4 * hct)
    grid = (nh, Bp // Bt)
    out_shape = [
        jax.ShapeDtypeStruct((Bp, H, W, C), x.dtype),
        jax.ShapeDtypeStruct((Bp, H, W, C), x.dtype),
    ]
    cin = xh.shape[-1]
    h_new, c_new = pl.pallas_call(
        functools.partial(_conv_lstm_kernel, k=k, H=H, W=W),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Bt, H + 2 * p, W + 2 * p, cin),
                         lambda n, i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, H, W, hct), lambda n, i: (i, 0, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k * k, cin, 4 * hct), lambda n, i: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4 * hct), lambda n, i: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Bt, H, W, hct), lambda n, i: (i, 0, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, H, W, hct), lambda n, i: (i, 0, 0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(xh, c, wp, bp)
    return h_new[:B], c_new[:B]


def fused_conv_lstm_cell(params, state, x, interpret: bool = False):
    """Drop-in for ops.lstm.conv_lstm_cell backed by the fused kernel.
    Gates computed in f32 (MXU-accumulated); outputs in x.dtype."""
    h, c = state
    w = params["gates"]["w"]
    b = params["gates"].get("b")
    if b is None:
        b = jnp.zeros((w.shape[-1],), jnp.float32)
    h_new, c_new = _fused_cell_fwd(x, h, c, w, b, interpret=interpret)
    return h_new, (h_new, c_new)

"""Planning costs: robot / world decomposed rewards as batched pure functions.

Re-derives the reference's `Cost` hierarchy (reference:
src/prediction/losses.py:172-335) as jnp functions over batched arrays so
the whole cost stack fuses into the jitted CEM rollout graph. The reference
evaluates costs per candidate-batch on GPU then syncs to numpy every step
(losses.py:231-238, 264-268); here cost evaluation never leaves the device.

Conventions (identical to the reference):
  * costs are *rewards* — negated distances; the planner maximizes.
  * images are float in [0,1]; distances are computed on a 255 scale
    (losses.py:229 multiplies by 255).
  * the don't-care image cost zeroes the union of current and goal robot
    masks and normalizes by the world-pixel count (losses.py:244-268).

Shapes: curr_img (N,H,W,C), goal_img (H,W,C) or (N,H,W,C); masks (...,1).
Returns (N,) float32 rewards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from robot_aware_control_tpu.config import Config


def _bsum(x):
    """Sum over all but the leading batch axis."""
    return jnp.sum(x, axis=tuple(range(1, x.ndim)))


def robot_l2_cost(curr_state, goal_state):
    """-||curr - goal||_2 over state vectors (reference: losses.py:183-207)."""
    d = (curr_state.astype(jnp.float32) - goal_state.astype(jnp.float32)) ** 2
    return -jnp.sqrt(_bsum(d))


def img_l2_cost(cfg: Config, curr_img, goal_img):
    """-||255*(curr - goal)||_2 per batch element; optional threshold-count
    mode (reference: losses.py:210-238)."""
    c = curr_img.astype(jnp.float32)
    g = goal_img.astype(jnp.float32)
    if cfg.img_cost_threshold is not None:
        diff = jnp.abs(255.0 * (c - g))
        return -_bsum(diff > cfg.img_cost_threshold).astype(jnp.float32)
    d = (255.0 * (c - g)) ** 2
    return -jnp.sqrt(_bsum(d))


def img_dontcare_cost(cfg: Config, curr_img, goal_img, curr_mask, goal_mask):
    """L2 over the union-masked world region, normalized by world pixels
    (reference: losses.py:240-288)."""
    c = curr_img.astype(jnp.float32)
    g = goal_img.astype(jnp.float32)
    union = (curr_mask.astype(jnp.float32) > 0.5) | (
        goal_mask.astype(jnp.float32) > 0.5
    )  # (..., H, W, 1)
    keep = 1.0 - union.astype(jnp.float32)
    if cfg.img_cost_threshold is not None:
        diff = jnp.abs(255.0 * (c - g)) * keep
        loss = _bsum(diff > cfg.img_cost_threshold).astype(jnp.float32)
    else:
        d = ((255.0 * (c - g)) * keep) ** 2
        loss = jnp.sqrt(_bsum(d))
    if cfg.img_cost_world_norm:
        num_world = _bsum(1.0 - union.astype(jnp.float32))
        loss = loss / jnp.maximum(num_world, 1.0)
    return -loss


def _gaussian_kernel1d(sigma: float, radius: int):
    xs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-(xs ** 2) / (2.0 * sigma ** 2))
    return k / jnp.sum(k)


def gaussian_blur(img, sigma: float, radius: int):
    """Separable depthwise gaussian blur, NHWC."""
    k = _gaussian_kernel1d(sigma, radius)
    c = img.shape[-1]
    x = img.astype(jnp.float32)
    kv = jnp.tile(k[:, None, None, None], (1, 1, 1, c))
    kh = jnp.tile(k[None, :, None, None], (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kv.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, kv, (1, 1), "SAME",
                                     dimension_numbers=dn,
                                     feature_group_count=c)
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "SAME",
                                     dimension_numbers=dn,
                                     feature_group_count=c)
    return x


class InpaintBlurCost:
    """Gaussian-blurred image MSE cost for the inpaint-blur reward
    (reference: src/prediction/losses.py:109-154). Matches the reference's
    skimage-gaussian + uint8 quantization semantics: blur with
    sigma=blur_sigma truncated to the blur window, truncate to 1/255 steps
    (the reference's (255*gaussian(...)).astype(np.uint8) floors), then
    cost = -MSE per batch element (unblurred images use
    -unblur_cost_scale * MSE). Returns (N,) so it composes with the batched
    CEM rollout engines like img_l2_cost/img_dontcare_cost."""

    def __init__(self, cfg: Config):
        self.sigma = cfg.blur_sigma
        self.unblur_cost_scale = cfg.unblur_cost_scale
        # radius from the reference's truncate math: (w-1)/2 - 0.5 pixels
        self.radius = max(int(((cfg.img_dim * 2 - 1) / 2 - 0.5)), 1)

    def __call__(self, img, goal, blur=True):
        """`blur` may be a python bool (static) or a traced boolean scalar —
        the latter is how --unblur_timestep switches the planning rollout
        from blurred to unblurred cost for the last steps of the horizon
        (the reference documents this switch at config/__init__.py:66 but
        never implements it: unblur_timestep has no consumer and
        clutter_push.py:236 pins _use_unblur=False; we implement the
        documented semantics)."""
        img = jnp.asarray(img, jnp.float32)
        goal = jnp.asarray(goal, jnp.float32)
        if img.ndim == 3:
            img = img[None]
        if goal.ndim == 3:
            goal = goal[None]

        def blurred_cost():
            bi = jnp.floor(255.0 * gaussian_blur(img, self.sigma, self.radius)) / 255.0
            bg = jnp.floor(255.0 * gaussian_blur(goal, self.sigma, self.radius)) / 255.0
            return -1.0 * jnp.mean((bi - bg) ** 2, axis=(1, 2, 3))

        def unblurred_cost():
            return -self.unblur_cost_scale * jnp.mean(
                (img - goal) ** 2, axis=(1, 2, 3)
            )

        if isinstance(blur, bool):
            return blurred_cost() if blur else unblurred_cost()
        return jnp.where(blur, blurred_cost(), unblurred_cost())


def _mask2d(mask, like):
    """Broadcast a (...,H,W[,1]) mask against a (N,H,W,C) image batch."""
    m = jnp.asarray(mask, jnp.float32)
    if m.shape[-1] != 1:  # no channel axis: (H,W) / (N,H,W)
        m = m[..., None]
    m = (m > 0.5).astype(jnp.float32)
    return jnp.broadcast_to(m, like.shape[:-1] + (1,))


def img_weighted_cost(cfg: Config, curr_img, goal_img, curr_mask, goal_mask):
    """weighted reward: per-pixel diff with robot pixels down-weighted by
    robot_pixel_weight — applied once per mask, so pixels in BOTH masks get
    weight^2, exactly the reference's sequential in-place multiplies
    (reference: src/env/robotics/clutter_push.py:717-721)."""
    c = curr_img.astype(jnp.float32)
    g = jnp.broadcast_to(goal_img.astype(jnp.float32), c.shape)
    a = cfg.robot_pixel_weight
    w = jnp.where(_mask2d(goal_mask, c) > 0, a, 1.0)
    w = w * jnp.where(_mask2d(curr_mask, c) > 0, a, 1.0)
    d = (255.0 * (c - g) * w) ** 2
    return -jnp.sqrt(_bsum(d))


def img_inpaint_cost(cfg: Config, curr_img, goal_img, curr_mask,
                     background=None):
    """inpaint reward: replace current robot pixels with the background
    image (goal is assumed pre-inpainted at goal-capture time), then plain
    L2 (reference: src/env/robotics/clutter_push.py:689-717,524-528). With
    no background available, robot pixels are zeroed (== blackrobot)."""
    c = curr_img.astype(jnp.float32)
    g = jnp.broadcast_to(goal_img.astype(jnp.float32), c.shape)
    m = _mask2d(curr_mask, c)
    bg = jnp.zeros_like(c) if background is None else jnp.broadcast_to(
        jnp.asarray(background, jnp.float32), c.shape)
    c = c * (1.0 - m) + bg * m
    return -jnp.sqrt(_bsum((255.0 * (c - g)) ** 2))


def img_blackrobot_cost(cfg: Config, curr_img, goal_img, curr_mask):
    """blackrobot reward: zero current robot pixels, plain L2 vs the
    (pre-blacked) goal (reference: clutter_push.py:722-728,530-532)."""
    c = curr_img.astype(jnp.float32)
    g = jnp.broadcast_to(goal_img.astype(jnp.float32), c.shape)
    c = c * (1.0 - _mask2d(curr_mask, c))
    return -jnp.sqrt(_bsum((255.0 * (c - g)) ** 2))


def img_sparse_cost(cfg: Config, curr_img, goal_img):
    """sparse reward: -(||curr-goal|| > threshold) (reference:
    clutter_push.py:742-744); threshold = img_cost_threshold (default 0 =>
    any mismatch costs 1)."""
    d = -img_l2_cost(cfg.replace(img_cost_threshold=None), curr_img, goal_img)
    thresh = cfg.img_cost_threshold or 0.0
    return -(d > thresh).astype(jnp.float32)


class RobotWorldCost:
    """robot_cost_weight * RobotL2 + world_cost_weight * WorldCost with the
    world cost dispatched per reward_type (reference: losses.py:290-335
    picks ImgDontcare vs ImgL2; the env-side weighted/inpaint/blackrobot/
    sparse semantics live in clutter_push.py:681-744 and are folded in here
    so every config.py reward_type value has an explicit branch).

    eef_inpaint = robot-eef L2 + inpainted-image L2, the reference's
    commented eef_inpaint_cost (losses.py:161-170): the robot term is the
    standard robot_cost_weight * robot_l2_cost, the world term is inpaint.
    Pure; call under jit. Returns (N,) rewards."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.robot_w = cfg.robot_cost_weight
        self.world_w = cfg.world_cost_weight
        self.reward_type = cfg.reward_type
        # inpaint-blur reward: gaussian-blurred image MSE
        # (reference: losses.py:109-154, reward_type inpaint-blur)
        self.blur = (
            InpaintBlurCost(cfg) if cfg.reward_type == "inpaint-blur" else None
        )

    def world_cost(self, curr_img, goal_img, curr_mask=None, goal_mask=None,
                   background=None, blur: bool = True):
        rt = self.reward_type
        cfg = self.cfg
        if rt == "dontcare":
            return img_dontcare_cost(cfg, curr_img, goal_img, curr_mask,
                                     goal_mask)
        if rt == "inpaint-blur":
            return self.blur(curr_img, goal_img, blur=blur)
        if rt in ("inpaint", "eef_inpaint"):
            return img_inpaint_cost(cfg, curr_img, goal_img, curr_mask,
                                    background)
        if rt == "blackrobot":
            return img_blackrobot_cost(cfg, curr_img, goal_img, curr_mask)
        if rt == "weighted":
            if curr_mask is None or goal_mask is None:
                return img_l2_cost(cfg, curr_img, goal_img)
            return img_weighted_cost(cfg, curr_img, goal_img, curr_mask,
                                     goal_mask)
        if rt == "sparse":
            return img_sparse_cost(cfg, curr_img, goal_img)
        # dense and anything else: plain image L2
        return img_l2_cost(cfg, curr_img, goal_img)

    def __call__(self, curr_img, goal_img, curr_mask=None, goal_mask=None,
                 curr_state=None, goal_state=None, background=None,
                 blur: bool = True):
        total = 0.0
        if self.robot_w != 0 and curr_state is not None and goal_state is not None:
            total = total + self.robot_w * robot_l2_cost(curr_state, goal_state)
        if self.world_w != 0:
            total = total + self.world_w * self.world_cost(
                curr_img, goal_img, curr_mask, goal_mask,
                background=background, blur=blur,
            )
        return total

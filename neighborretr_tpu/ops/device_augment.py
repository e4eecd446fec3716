"""Device-side (on-chip) RandAugment — the TPU-native train input pipeline.

Replaces the host RandAugment stage (data/augment.py + data/native/augment.cpp,
the reference's timm policy at dataloader_retrieval.py:154-158 +
rand_augment.py) with jitted JAX ops fused into the training step, directly
ahead of `normalize_frames`.  With the packed corpus (data/packed.py) the host
then only memcpy's pre-decoded uint8 clips (~0.6 ms/clip); the augment math
rides the accelerator, where one batch costs milliseconds instead of
~14 ms/clip/core on the host (PARITY round-4 measurement).

Design (TPU-first, not a PIL translation):

* The policy samples per CLIP (temporal consistency — the reference applies
  one sampled transform list to the whole PIL frame list,
  rawvideo_util.py:291-293): N layers, each drawing one of 16 ops, firing
  with p=0.5, magnitude m jittered by N(0, mstd) and clipped to [0, 10].
  Sampling is pure `jax.random` from the per-step PRNG key — different
  clips get independent draws, resume replays them exactly.

* Inside jit there is no data-dependent branching: each layer applies a
  fixed pipeline of op FAMILIES (affine warp → sharpness blend → color
  blend → per-channel linear → solarize family → posterize → 256-entry
  LUT), every family parameterized so that "inactive" is an exact
  identity on integer-valued pixels.  Since exactly one op is active per
  (clip, layer), the composition equals applying just that op.  All
  families are elementwise or small-window ops XLA fuses over the uint8
  [B, F, H, W, 3] batch; layer boundaries round+clip back to uint8 (PIL
  materializes uint8 between ops too), bounding every intermediate at 1
  byte/pixel of HBM traffic.

* Stats ops (AutoContrast min/max, Equalize histogram, Contrast mean)
  read the LAYER INPUT: they can never co-occur with the geometric /
  blend families in the same layer (one op per layer), so the input
  equals the image the op would see.  The Equalize histogram is computed
  on a stride-subsampled pixel grid (default 4 → 1/16 of pixels) and
  rescaled — a documented deviation; the cumulative LUT is an integral,
  so subsampling noise is smoothed away.

* Bit parity with PIL is NOT required (SURVEY §7; the reference's augment
  is itself stochastic).  Deviations vs the host backend, all
  distribution-level: float arithmetic with floor-style rounding at layer
  end (PIL truncates after blends, rounds in filters), subsampled
  equalize histogram, bilinear warp with clamp-edge taps + zero fill
  outside the source rect (same convention as data/native/augment.cpp).

Reference contract: rand_augment.py:576-611 (op set; this mirrors the HOST
backend's 16-op table in data/augment.py, which adds Identity),
dataloader_retrieval.py:154-158 (the rand-m7-n4-mstd0.5-inc1 policy).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Op index table — MUST match data/augment.py::_RAND_OPS insertion order so
# host and device backends sample the same categorical distribution.
OP_NAMES = (
    "AutoContrast", "Equalize", "Invert", "Identity", "Posterize",
    "Solarize", "SolarizeAdd", "Color", "Contrast", "Brightness",
    "Sharpness", "ShearX", "ShearY", "TranslateX", "TranslateY", "Rotate",
)
_OP = {name: i for i, name in enumerate(OP_NAMES)}
_MAX_LEVEL = 10.0


@dataclasses.dataclass(frozen=True)
class DeviceAugmentPolicy:
    """Parsed rand-mM-nN-mstdS[-pP]-inc1 policy (timm string grammar —
    same parser contract as data/augment.py::RandAugment.from_config_str)."""
    magnitude: int = 7
    num_layers: int = 4
    magnitude_std: float = 0.5
    prob: float = 0.5
    hist_stride: int = 4    # equalize-histogram pixel subsampling stride

    @classmethod
    def parse(cls, config: str) -> "DeviceAugmentPolicy":
        parts = config.split("-")
        if parts[0] != "rand":
            raise ValueError(f"not a rand-augment config: '{config}'")
        kwargs = {}
        for p in parts[1:]:
            if p.startswith("mstd"):
                kwargs["magnitude_std"] = float(p[4:])
            elif p.startswith("p") and p[1:2].isdigit():
                kwargs["prob"] = float(p[1:])
            elif p.startswith("m") and p[1:].isdigit():
                kwargs["magnitude"] = int(p[1:])
            elif p.startswith("n") and p[1:].isdigit():
                kwargs["num_layers"] = int(p[1:])
            elif p == "inc1":
                pass
            else:
                raise ValueError(
                    f"unsupported RandAugment config segment '{p}' in "
                    f"'{config}' (supported: mN, nN, mstdF, pF, inc1)")
        return cls(**kwargs)


def sample_policy(key: jax.Array, batch: int, pol: DeviceAugmentPolicy):
    """Per-clip draws for all layers: (op_idx [B,N] i32, fire [B,N] bool,
    level [B,N] f32 in [0,10], neg [B,N] bool).  One op list per CLIP,
    shared by its frames (temporal consistency)."""
    k_op, k_fire, k_lvl, k_neg = jax.random.split(key, 4)
    n = pol.num_layers
    op_idx = jax.random.randint(k_op, (batch, n), 0, len(OP_NAMES))
    fire = jax.random.uniform(k_fire, (batch, n)) < pol.prob
    level = jnp.clip(
        pol.magnitude
        + pol.magnitude_std * jax.random.normal(k_lvl, (batch, n)),
        0.0, _MAX_LEVEL)
    neg = jax.random.uniform(k_neg, (batch, n)) < 0.5
    return op_idx, fire, level, neg


# ---------------------------------------------------------------------------
# Per-family building blocks (all shapes [B, F, H, W, 3] unless noted)
# ---------------------------------------------------------------------------

def _grayscale_i32(x_i32: jnp.ndarray) -> jnp.ndarray:
    """PIL 'L' conversion on int32 pixels: (19595r+38470g+7471b+0x8000)>>16
    (probed Pillow 12.1.0 semantics — data/native/augment.cpp)."""
    r, g, b = x_i32[..., 0], x_i32[..., 1], x_i32[..., 2]
    return (19595 * r + 38470 * g + 7471 * b + 0x8000) >> 16


def _smooth_u8(x_u8: jnp.ndarray) -> jnp.ndarray:
    """PIL ImageFilter.SMOOTH: 3×3 kernel (center 5, ring 1)/13, +0.5 floor,
    border pixels copied from the input (filter runs on the interior only)."""
    x = x_u8.astype(jnp.float32)
    c = x[..., 1:-1, 1:-1, :]
    acc = 5.0 * c
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            acc = acc + x[..., 1 + dy:x.shape[-3] - 1 + dy,
                          1 + dx:x.shape[-2] - 1 + dx, :]
    interior = jnp.floor(acc * (1.0 / 13.0) + 0.5)
    sm = jnp.pad(interior,
                 [(0, 0)] * (x.ndim - 3) + [(1, 1), (1, 1), (0, 0)])
    h, w = x.shape[-3], x.shape[-2]
    row = jnp.arange(h)
    col = jnp.arange(w)
    border = ((row[:, None] == 0) | (row[:, None] == h - 1)
              | (col[None, :] == 0) | (col[None, :] == w - 1))
    return jnp.where(border[..., None], x, sm).astype(jnp.uint8)


def _affine_matrices(op_idx, fire, level, neg, H: int, W: int):
    """Per-clip inverse-map affine coefficients [B, 6] (a,b,c,d,e,f):
    src_x = a·(x+.5) + b·(y+.5) + c ; src_y = d·(x+.5) + e·(y+.5) + f,
    identity unless a geometric op is active.  PIL transform() receives the
    inverse map directly (data/native/augment.cpp convention)."""
    sign = jnp.where(neg, -1.0, 1.0)
    frac = level / _MAX_LEVEL
    shear = 0.3 * frac * sign
    trans = 0.45 * frac * sign
    theta = jnp.deg2rad(30.0 * frac * sign)

    def act(name):
        return fire & (op_idx == _OP[name])

    a = jnp.ones_like(level)
    b = jnp.zeros_like(level)
    c = jnp.zeros_like(level)
    d = jnp.zeros_like(level)
    e = jnp.ones_like(level)
    f = jnp.zeros_like(level)
    b = jnp.where(act("ShearX"), shear, b)
    d = jnp.where(act("ShearY"), shear, d)
    c = jnp.where(act("TranslateX"), trans * W, c)
    f = jnp.where(act("TranslateY"), trans * H, f)
    # PIL rotate(θ CCW): inverse map about the image center (W/2, H/2) —
    # PIL builds [cos(−θ), sin(−θ); −sin(−θ), cos(−θ)] and re-centers, i.e.
    # b = −sin θ, d = +sin θ with image-axis y down (probed against
    # Image.rotate internals; tests pin the convention per level/sign)
    rot = act("Rotate")
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cx, cy = W / 2.0, H / 2.0
    a = jnp.where(rot, cos, a)
    b = jnp.where(rot, -sin, b)
    c = jnp.where(rot, cx - cos * cx + sin * cy, c)
    d = jnp.where(rot, sin, d)
    e = jnp.where(rot, cos, e)
    f = jnp.where(rot, cy - sin * cx - cos * cy, f)
    return jnp.stack([a, b, c, d, e, f], axis=-1)


def _warp_u8(x_u8: jnp.ndarray, coeff: jnp.ndarray) -> jnp.ndarray:
    """Bilinear affine warp, per-clip coeff [B,6], frames share the mapping.
    Taps clamp to the edge; output is zero-filled where the PRE-shift source
    coordinate leaves [0, size) (the probed PIL fill convention —
    data/native/augment.cpp).  +0.5-floor back to uint8."""
    B, F, H, W, C = x_u8.shape
    xs = jnp.arange(W, dtype=jnp.float32) + 0.5
    ys = jnp.arange(H, dtype=jnp.float32) + 0.5
    a, b, c, d, e, f = (coeff[:, i].reshape(B, 1, 1) for i in range(6))
    src_x = a * xs[None, None, :] + b * ys[None, :, None] + c   # [B,H,W]
    src_y = d * xs[None, None, :] + e * ys[None, :, None] + f
    valid = ((src_x >= 0) & (src_x < W) & (src_y >= 0) & (src_y < H))
    gx = src_x - 0.5
    gy = src_y - 0.5
    x0f = jnp.floor(gx)
    y0f = jnp.floor(gy)
    fx = (gx - x0f)[..., None]                                  # [B,H,W,1]
    fy = (gy - y0f)[..., None]
    # clamp each tap independently from the UNCLIPPED floor: when the floor
    # itself is out of range (x0f = −1 at the left border) both taps must
    # collapse onto column 0 — clipping x0 first and adding 1 would pull the
    # interior neighbor in with weight fx (PIL single-taps the border column
    # there; probed on Pillow 12.1.0)
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, H - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, W - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, H - 1)

    flat = x_u8.reshape(B, F, H * W, C)

    def tap(yi, xi):
        idx = (yi * W + xi).reshape(B, 1, H * W, 1)
        g = jnp.take_along_axis(flat, jnp.broadcast_to(idx, (B, F, H * W, C)),
                                axis=2)
        return g.reshape(B, F, H, W, C).astype(jnp.float32)

    top = tap(y0, x0) * (1 - fx)[:, None] + tap(y0, x1) * fx[:, None]
    bot = tap(y1, x0) * (1 - fx)[:, None] + tap(y1, x1) * fx[:, None]
    out = top * (1 - fy)[:, None] + bot * fy[:, None]
    out = jnp.where(valid[:, None, :, :, None], jnp.floor(out + 0.5), 0.0)
    return out.astype(jnp.uint8)


def _equalize_lut(hist: jnp.ndarray, scale: float) -> Tuple[jnp.ndarray,
                                                            jnp.ndarray]:
    """PIL ImageOps.equalize LUT from per-frame-channel histograms
    [..., 256] of SUBSAMPLED counts (`scale` = stride² rescale to
    full-image-equivalent counts).  Returns (lut [..., 256] f32 in
    [0,255], identity_mask [...] bool — frames where PIL would no-op:
    ≤1 occupied bin or integer step 0)."""
    h = hist * scale
    nz = hist > 0
    n_occupied = jnp.sum(nz, axis=-1)
    # count in the HIGHEST occupied bin (PIL: histo[-1] after dropping 0s)
    last_v = 255 - jnp.argmax(nz[..., ::-1].astype(jnp.int32), axis=-1)
    h_last = jnp.take_along_axis(h, last_v[..., None], axis=-1)[..., 0]
    total = jnp.sum(h, axis=-1)
    step = jnp.floor((total - h_last) / 255.0)
    ident = (n_occupied <= 1) | (step <= 0)
    step = jnp.maximum(step, 1.0)
    cum_excl = jnp.cumsum(h, axis=-1) - h
    lut = jnp.floor((jnp.floor(step / 2.0)[..., None] + cum_excl) / step[..., None])
    return jnp.clip(lut, 0.0, 255.0), ident


def _layer(x: jnp.ndarray, op_idx, fire, level, neg,
           pol: DeviceAugmentPolicy) -> jnp.ndarray:
    """One RandAugment layer on uint8 [B,F,H,W,3]; per-clip params [B]."""
    B, F, H, W, C = x.shape

    def act(name):
        return fire & (op_idx == _OP[name])

    frac = level / _MAX_LEVEL
    enh = 1.0 + 0.9 * frac
    enh = jnp.where(neg, 2.0 - enh, enh)        # enhance mirror, not negate

    # ---- stats on the layer INPUT (valid: stats ops are exclusive) ------
    xi = x.astype(jnp.int32)
    stride = max(1, min(pol.hist_stride, H // 8 or 1, W // 8 or 1))
    sub = xi[:, :, ::stride, ::stride, :]
    hist = jnp.sum(
        (sub[..., None] == jnp.arange(256, dtype=jnp.int32)).astype(
            jnp.float32),
        axis=(2, 3))                                        # [B,F,3,256]
    eq_lut, eq_ident = _equalize_lut(hist, float(stride * stride))
    lo = jnp.min(xi, axis=(2, 3)).astype(jnp.float32)       # [B,F,3]
    hi = jnp.max(xi, axis=(2, 3)).astype(jnp.float32)
    gray_mean = jnp.mean(_grayscale_i32(xi).astype(jnp.float32),
                         axis=(2, 3))                       # [B,F]
    # PIL ImageEnhance.Contrast: mean = int(mean_L + 0.5)
    gray_mean = jnp.floor(gray_mean + 0.5)

    # ---- 1. geometric warp ---------------------------------------------
    coeff = _affine_matrices(op_idx, fire, level, neg, H, W)
    x = _warp_u8(x, coeff)

    # ---- 2. sharpness: blend towards SMOOTH(x) --------------------------
    f_sharp = jnp.where(act("Sharpness"), enh, 1.0).reshape(B, 1, 1, 1, 1)
    sm = _smooth_u8(x).astype(jnp.float32)
    xf = x.astype(jnp.float32)
    xf = sm + f_sharp * (xf - sm)

    # ---- 3. color (saturation): blend towards grayscale -----------------
    f_color = jnp.where(act("Color"), enh, 1.0).reshape(B, 1, 1, 1, 1)
    g = _grayscale_i32(jnp.clip(xf, 0, 255).astype(jnp.int32)).astype(
        jnp.float32)[..., None]
    xf = g + f_color * (xf - g)

    # ---- 4. per-channel linear: contrast / brightness / autocontrast ----
    lin_a = jnp.ones((B, F, C), jnp.float32)
    lin_b = jnp.zeros((B, F, C), jnp.float32)
    a_con = act("Contrast")[:, None, None]
    f_con = jnp.where(act("Contrast"), enh, 1.0)[:, None, None]
    lin_a = jnp.where(a_con, f_con, lin_a)
    lin_b = jnp.where(a_con, gray_mean[..., None] * (1.0 - f_con), lin_b)
    a_bri = act("Brightness")[:, None, None]
    lin_a = jnp.where(a_bri, jnp.where(
        act("Brightness"), enh, 1.0)[:, None, None], lin_a)
    lin_b = jnp.where(a_bri, 0.0, lin_b)
    span = hi - lo
    ac_ok = span > 0
    ac_scale = jnp.where(ac_ok, 255.0 / jnp.maximum(span, 1.0), 1.0)
    ac_off = jnp.where(ac_ok, -lo * ac_scale, 0.0)
    a_ac = act("AutoContrast")[:, None, None]
    lin_a = jnp.where(a_ac, ac_scale, lin_a)
    lin_b = jnp.where(a_ac, ac_off, lin_b)
    xf = lin_a[:, :, None, None, :] * xf + lin_b[:, :, None, None, :]
    # PIL materializes uint8 after every op, so an enhance factor > 1
    # saturates at 255 — without this clip a brightened pixel ≥ 256 would
    # fall through the (inactive) solarize reflection below and come out
    # near-black
    xf = jnp.clip(xf, 0.0, 255.0)

    # ---- 5. solarize family (Invert = threshold 0) ----------------------
    thresh = jnp.full((B,), 256.0)
    thresh = jnp.where(act("Invert"), 0.0, thresh)
    sol_t = 256.0 - jnp.floor(frac * 256.0)
    thresh = jnp.where(act("Solarize"), sol_t, thresh)
    thresh = thresh.reshape(B, 1, 1, 1, 1)
    xf = jnp.where(xf >= thresh, 255.0 - xf, xf)
    add = jnp.where(act("SolarizeAdd"), jnp.floor(frac * 110.0),
                    0.0).reshape(B, 1, 1, 1, 1)
    xf = jnp.where(xf < 128.0, jnp.minimum(xf + add, 255.0), xf)

    # ---- 6. posterize (inc: bits 4→1; step 1 = exact identity) ----------
    bits = jnp.maximum(1, 4 - jnp.floor(frac * 4.0).astype(jnp.int32))
    pstep = jnp.where(act("Posterize"),
                      (1 << (8 - bits)).astype(jnp.float32),
                      1.0).reshape(B, 1, 1, 1, 1)
    xf = jnp.floor(xf / pstep) * pstep
    # the floor above doubles as the layer-end float→integer rounding
    # (PIL truncates after blends); clip to the pixel range
    idx = jnp.clip(xf, 0.0, 255.0).astype(jnp.int32)

    # ---- 7. equalize LUT (identity ramp when inactive) ------------------
    ident_ramp = jnp.arange(256, dtype=jnp.float32)
    use_eq = (act("Equalize")[:, None, None] & ~eq_ident)[..., None]
    lut = jnp.where(use_eq, eq_lut, ident_ramp)             # [B,F,3,256]
    # gather: flatten (value, channel) so one take_along_axis serves all
    # channels — out[..., c] = lut[b, f, c, idx]
    lut_flat = lut.transpose(0, 1, 3, 2).reshape(B, F, 256 * C)
    gidx = (idx * C + jnp.arange(C, dtype=jnp.int32)).reshape(B, F, H * W * C)
    out = jnp.take_along_axis(lut_flat, gidx, axis=2).reshape(B, F, H, W, C)
    return out.astype(jnp.uint8)


def apply_randaugment(video_u8: jnp.ndarray, key: jax.Array,
                      policy: "DeviceAugmentPolicy | str") -> jnp.ndarray:
    """uint8 [B, F, H, W, 3] → augmented uint8, jittable.  `key` is the
    per-step PRNG (train_step folds the global step in, so every step and
    every resume sees the same draws).  N layers applied in sampled order
    (layer l uses column l of the per-clip draws)."""
    if isinstance(policy, str):
        policy = DeviceAugmentPolicy.parse(policy)
    if video_u8.dtype != jnp.uint8:
        raise TypeError(
            f"device augment expects uint8 frames, got {video_u8.dtype} "
            "(is the host pipeline already normalizing?)")
    B = video_u8.shape[0]
    op_idx, fire, level, neg = sample_policy(key, B, policy)
    x = video_u8
    for layer in range(policy.num_layers):      # unrolled: N is static
        x = _layer(x, op_idx[:, layer], fire[:, layer], level[:, layer],
                   neg[:, layer], policy)
    return x


def augment_batch(video_u8: jnp.ndarray, video_mask: jnp.ndarray,
                  key: jax.Array,
                  policy: "DeviceAugmentPolicy | str") -> jnp.ndarray:
    """Masked batch augment: padding frames stay EXACTLY zero.

    The host pipeline augments only the valid prefix and leaves the zero
    padding untouched (datasets/base.py::video_item); whole-batch device ops
    would corrupt it (Invert maps 0 → 255, SolarizeAdd 0 → add), so the
    augmented frames are re-masked with `video_mask` [B, F]."""
    out = apply_randaugment(video_u8, key, policy)
    keep = (video_mask > 0)[:, :, None, None, None]
    return jnp.where(keep, out, jnp.zeros_like(out))

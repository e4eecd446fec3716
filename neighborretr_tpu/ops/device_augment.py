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
# Per-family building blocks.
#
# LAYOUT CONTRACT: the layer body works CHANNEL-MAJOR — [B, F, C, H, W] —
# because TPU tiles the two minor dims to (8, 128): any gather intermediate
# whose minor dims are (.., 3) or (.., 3, 1) pads ~42-5000× in HBM (a
# [96,12,50176,3,1] s32 warp index materialized as 29.6 GB on v5e).
# Channel-major keeps every gather's minor dimension at H·W or 256, where
# the tiling is dense.  apply_randaugment transposes once per layer edge.
# ---------------------------------------------------------------------------

def _grayscale_i32(x_i32: jnp.ndarray) -> jnp.ndarray:
    """PIL 'L' conversion on int32 pixels [.., C, H, W] → [.., H, W]:
    (19595r+38470g+7471b+0x8000)>>16 (probed Pillow 12.1.0 semantics —
    data/native/augment.cpp)."""
    r, g, b = x_i32[..., 0, :, :], x_i32[..., 1, :, :], x_i32[..., 2, :, :]
    return (19595 * r + 38470 * g + 7471 * b + 0x8000) >> 16


def _smooth_u8(x_u8: jnp.ndarray) -> jnp.ndarray:
    """PIL ImageFilter.SMOOTH on [.., H, W]-minor layouts: 3×3 kernel
    (center 5, ring 1)/13, +0.5 floor, border pixels copied from the input
    (the filter runs on the interior only)."""
    x = x_u8.astype(jnp.float32)
    h, w = x.shape[-2], x.shape[-1]
    c = x[..., 1:-1, 1:-1]
    acc = 5.0 * c
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            acc = acc + x[..., 1 + dy:h - 1 + dy, 1 + dx:w - 1 + dx]
    interior = jnp.floor(acc * (1.0 / 13.0) + 0.5)
    sm = jnp.pad(interior, [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)])
    row = jnp.arange(h)
    col = jnp.arange(w)
    border = ((row[:, None] == 0) | (row[:, None] == h - 1)
              | (col[None, :] == 0) | (col[None, :] == w - 1))
    return jnp.where(border, x, sm).astype(jnp.uint8)


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


def _interp_matrix(pos: jnp.ndarray, size: int) -> jnp.ndarray:
    """Two-tap interpolation matrices from continuous sample positions.

    pos [..., n_out] are PIL-convention positions (pixel i spans [i, i+1),
    center i+0.5).  Returns S [..., size(src), n_out] bf16 with
    S[..., s, o] = (1−f)·[s == clip(floor(pos−.5))] + f·[s == clip(+1)],
    zeroed where pos leaves [0, size) (PIL center-validity fill).  Taps
    clamp from the UNCLIPPED floor — at the border both taps collapse onto
    the edge texel, the probed Pillow 12.1.0 single-tap behavior.

    Applying a 1-D resample then becomes a matmul with S — the TPU-native
    carrier for per-element sampling: this hardware has no per-lane gather
    (XLA lowers one to a ~100× slower scalar loop; Mosaic's dynamic_gather
    does not compile on this toolchain), but banded interpolation matrices
    ride the MXU at memory-bound speed."""
    valid = (pos >= 0) & (pos < size)
    g = pos - 0.5
    t0f = jnp.floor(g)
    f = (g - t0f).astype(jnp.float32)
    t0 = jnp.clip(t0f.astype(jnp.int32), 0, size - 1)
    t1 = jnp.clip(t0f.astype(jnp.int32) + 1, 0, size - 1)
    src = jax.lax.broadcasted_iota(jnp.int32, (size, 1), 0)   # [size, 1]
    shape = pos.shape[:-1] + (size, pos.shape[-1])
    s = ((src == t0[..., None, :]) * (1.0 - f[..., None, :])
         + (src == t1[..., None, :]) * f[..., None, :])
    s = jnp.where(valid[..., None, :], s, 0.0)
    return jnp.broadcast_to(s, shape).astype(jnp.bfloat16)


def _warp_affine_cm(x_u8: jnp.ndarray, coeff: jnp.ndarray) -> jnp.ndarray:
    """Bilinear affine warp on CHANNEL-MAJOR frames [B, F, C, H, W];
    per-clip inverse map coeff [B, 6] (a,b,c,d,e,f as _affine_matrices).

    Two-pass separable resampling (classic two-pass warping): a horizontal
    pass whose per-row sample positions are pre-composed with the vertical
    map's inverse — X1'(r, x) = (a − bd/e)·x + (b/e)·r + (c − bf/e) — then
    a vertical pass at Y2(y, x) = d·x + e·y + f.  Each pass is a batched
    [K, n]×[n, n] matmul against a two-tap interpolation matrix
    (_interp_matrix), so the whole warp is MXU work + ~4×image of HBM
    traffic instead of per-pixel gathers.

    Exactness: single-axis ops (shear/translate X or Y) leave one pass an
    identity, reproducing PIL's transform within ±1; rotations genuinely
    interpolate twice (documented deviation — the sample lattice of the
    second pass differs from one-pass 2-D bilinear by up to ~|b/e| px).
    |e| is clamped away from 0 (only reachable by freak multi-rotation
    compositions summing to ±90°, measure-zero in the sampled policy)."""
    B, F, C, H, W = x_u8.shape
    K = F * C
    a, b, c, d, e, f = (coeff[:, i] for i in range(6))
    e_safe = jnp.where(jnp.abs(e) < 0.05,
                       jnp.where(e < 0, -0.05, 0.05), e)
    a1 = (a - b * d / e_safe)[:, None, None]
    b1 = (b / e_safe)[:, None, None]
    c1 = (c - b * f / e_safe)[:, None, None]

    xs = jnp.arange(W, dtype=jnp.float32) + 0.5     # center coords
    ys = jnp.arange(H, dtype=jnp.float32) + 0.5
    # pass 1: horizontal — rows r are SOURCE rows; positions [B, H(r), W(x)]
    pos1 = a1 * xs[None, None, :] + b1 * ys[None, :, None] + c1
    s1 = _interp_matrix(pos1, W)                    # [B, H, W(src), W(out)]
    img = x_u8.reshape(B, K, H, W).astype(jnp.bfloat16)
    # [B, r, K, w] × [B, r, w, x] → [B, r, K, x]
    mid = jnp.einsum("bkrw,brwx->brkx", img, s1,
                     preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    # pass 2: vertical — positions [B, W(x), H(y)]
    pos2 = (d[:, None, None] * xs[None, :, None]
            + e[:, None, None] * ys[None, None, :] + f[:, None, None])
    s2 = _interp_matrix(pos2, H)                    # [B, W, H(src), H(out)]
    # [B, x, K, r] × [B, x, r, y] → [B, x, K, y]
    out = jnp.einsum("brkx,bxry->bxky", mid, s2,
                     preferred_element_type=jnp.float32)
    out = jnp.clip(jnp.floor(out + 0.5), 0.0, 255.0)
    return out.transpose(0, 2, 3, 1).reshape(B, F, C, H, W).astype(jnp.uint8)


def compose_affine(mats: jnp.ndarray) -> jnp.ndarray:
    """Compose per-layer inverse maps [B, N, 6] → one [B, 6]: the overall
    inverse map of ops applied in layer order is M_1 ∘ M_2 ∘ … ∘ M_N
    (first op outermost — img_after = img0[m_a(m_b(p))] for op a then b)."""
    B, N, _ = mats.shape

    def to3(m):
        a, b, c, d, e, f = (m[..., i] for i in range(6))
        z = jnp.zeros_like(a)
        o = jnp.ones_like(a)
        return jnp.stack([jnp.stack([a, b, c], -1),
                          jnp.stack([d, e, f], -1),
                          jnp.stack([z, z, o], -1)], -2)   # [..., 3, 3]

    m = to3(mats[:, 0])
    for i in range(1, N):
        m = jnp.einsum("bij,bjk->bik", m, to3(mats[:, i]))
    return jnp.stack([m[:, 0, 0], m[:, 0, 1], m[:, 0, 2],
                      m[:, 1, 0], m[:, 1, 1], m[:, 1, 2]], -1)


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


def _value_layer_cm(x: jnp.ndarray, op_idx, fire, level, neg,
                    pol: DeviceAugmentPolicy) -> jnp.ndarray:
    """One RandAugment layer's VALUE ops on channel-major uint8
    [B, F, C, H, W]; per-clip params [B].  Geometric ops and Equalize are
    handled outside the layer loop (composed warp / single LUT apply) —
    their per-pixel sampling is the expensive part on this hardware, so
    they run once per clip instead of once per layer."""
    B, F, C, H, W = x.shape

    def act(name):
        return fire & (op_idx == _OP[name])

    frac = level / _MAX_LEVEL
    enh = 1.0 + 0.9 * frac
    enh = jnp.where(neg, 2.0 - enh, enh)        # enhance mirror, not negate

    m = _active_slots(B)

    # ---- stats on the layer INPUT (valid: stats ops are exclusive) ------
    # Reductions run only over the clips whose ops read them
    # (AutoContrast: lo/hi; Contrast: gray mean) — unselected entries keep
    # placeholders that the act()-gated selects below never read.
    stat_idx, _ = _take_active(act("AutoContrast") | act("Contrast"), m)
    xsub = jnp.take(x, stat_idx, axis=0).astype(jnp.int32)
    lo = jnp.zeros((B, F, C), jnp.float32).at[stat_idx].set(
        jnp.min(xsub, axis=(3, 4)).astype(jnp.float32))
    hi = jnp.full((B, F, C), 255.0).at[stat_idx].set(
        jnp.max(xsub, axis=(3, 4)).astype(jnp.float32))
    # PIL ImageEnhance.Contrast: mean = int(mean_L + 0.5)
    gray_mean = jnp.zeros((B, F), jnp.float32).at[stat_idx].set(jnp.floor(
        jnp.mean(_grayscale_i32(xsub).astype(jnp.float32), axis=(2, 3))
        + 0.5))

    # ---- sharpness: blend towards SMOOTH(x), active subset only ---------
    # (for an unselected clip f_sharp = 1 → the blend is an exact identity,
    # so skipping it changes nothing; the SMOOTH filter is ~16 HBM passes
    # and must not run for all B clips.)  One op fires per clip-layer, so
    # the blend result rounds straight back to uint8 — the remaining stages
    # are exact identities on integer pixels for this clip — keeping the
    # whole inter-stage carry at 1 byte/px instead of an f32 tensor.
    shp_idx, _ = _take_active(act("Sharpness"), m)
    sub_u8 = jnp.take(x, shp_idx, axis=0)
    sm = _smooth_u8(sub_u8).astype(jnp.float32)
    f_sharp = jnp.where(act("Sharpness"), enh, 1.0)[shp_idx].reshape(
        m, 1, 1, 1, 1)
    blended = sm + f_sharp * (sub_u8.astype(jnp.float32) - sm)
    x = x.at[shp_idx].set(
        jnp.floor(jnp.clip(blended, 0.0, 255.0)).astype(jnp.uint8))

    # ---- color (saturation): blend towards grayscale, active subset -----
    col_idx, _ = _take_active(act("Color"), m)
    sub = jnp.take(x, col_idx, axis=0).astype(jnp.float32)
    g = _grayscale_i32(sub.astype(jnp.int32)).astype(
        jnp.float32)[:, :, None, :, :]
    f_color = jnp.where(act("Color"), enh, 1.0)[col_idx].reshape(
        m, 1, 1, 1, 1)
    x = x.at[col_idx].set(jnp.floor(jnp.clip(
        g + f_color * (sub - g), 0.0, 255.0)).astype(jnp.uint8))

    xf = x.astype(jnp.float32)

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
    xf = lin_a[:, :, :, None, None] * xf + lin_b[:, :, :, None, None]
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
    return jnp.clip(xf, 0.0, 255.0).astype(jnp.uint8)


def _active_slots(batch: int) -> int:
    """Fixed per-batch processing slots for the rare expensive ops.

    Equalize/Sharpness/stats ops each fire for ~B/32 clips per layer (and
    ~B/8 across 4 layers), but a static program would pay their per-pixel
    cost for every clip.  Instead the pipeline gathers up to this many
    ACTIVE clips, runs the expensive math on the subset, and scatters back.
    With slots = max(8, ⌈B/6⌉) the probability that active clips exceed
    the slots (and silently skip the op — a stochastic-policy deviation,
    never a wrong pixel) is <1e-3 per batch at the rand-m7-n4 rates."""
    return batch if batch <= 8 else max(8, -(-batch // 6))


def _take_active(active_b: jnp.ndarray, m: int):
    """Indices of up to m active clips (actives first, stable order) and
    their activity flags."""
    order = jnp.argsort(~active_b)          # stable: False(=active) first
    idx = order[:m]
    return idx, active_b[idx]


def _equalize_apply_cm(x: jnp.ndarray, eq_act: jnp.ndarray,
                       pol: DeviceAugmentPolicy) -> jnp.ndarray:
    """Apply ImageOps.equalize to the clips where `eq_act` [B] is set
    (channel-major uint8 in/out).

    The histogram reads a stride-subsampled grid (documented deviation;
    the LUT is an integral so the noise smooths out).  The per-pixel LUT
    application is gather-free — per-lane gathers don't exist on this
    hardware (XLA's lowering measured ~2 s/batch; Mosaic's dynamic_gather
    doesn't compile on this toolchain) — so it runs as a 256-bin
    compare-select REDUCTION that XLA fuses into one pass, and only over
    the gathered active-clip subset (_active_slots)."""
    B, F, C, H, W = x.shape
    m = _active_slots(B)
    idx, act = _take_active(eq_act, m)
    xs = jnp.take(x, idx, axis=0)                           # [m,F,C,H,W]
    xi = xs.astype(jnp.int32)
    stride = max(1, min(pol.hist_stride, H // 8 or 1, W // 8 or 1))
    sub = xi[:, :, :, ::stride, ::stride]
    bins = jnp.arange(256, dtype=jnp.int32)
    hist = jnp.sum((sub[..., None] == bins).astype(jnp.float32),
                   axis=(3, 4))                             # [m,F,C,256]
    lut, ident = _equalize_lut(hist, float(stride * stride))
    use = act[:, None, None] & ~ident                       # [m,F,C]
    ramp = jnp.arange(256, dtype=jnp.float32)
    table = jnp.where(use[..., None], lut, ramp)            # [m,F,C,256]
    out = jnp.sum((xi[..., None] == bins)
                  * table[:, :, :, None, None, :], axis=-1)
    return x.at[idx].set(out.astype(jnp.uint8))


def _layer(x_hwc: jnp.ndarray, op_idx, fire, level, neg,
           pol: DeviceAugmentPolicy) -> jnp.ndarray:
    """ONE full layer in HWC (parity tests drive single ops through this):
    value ops → equalize → warp.  Production (apply_randaugment) hoists the
    warp/equalize stages out of the layer loop — for a single active op the
    two paths coincide exactly."""
    x = x_hwc.transpose(0, 1, 4, 2, 3)
    x = _value_layer_cm(x, op_idx, fire, level, neg, pol)
    x = _equalize_apply_cm(x, fire & (op_idx == _OP["Equalize"]), pol)
    x = _warp_affine_cm(x, _affine_matrices(op_idx, fire, level, neg,
                                            x.shape[3], x.shape[4]))
    return x.transpose(0, 1, 3, 4, 2)


def apply_randaugment(video_u8: jnp.ndarray, key: jax.Array,
                      policy: "DeviceAugmentPolicy | str") -> jnp.ndarray:
    """uint8 [B, F, H, W, 3] → augmented uint8, jittable.  `key` is the
    per-step PRNG (train_step folds the global step in, so every step and
    every resume sees the same draws).

    Stage order (a deliberate TPU-first reordering of PIL's op-sequential
    application; single-op clips are unaffected, multi-op compositions
    deviate at distribution level — documented):
      1. each layer's VALUE ops, in layer order (exact per-op PIL parity);
      2. ONE equalize where any layer fired it (LUT from the post-value
         state; multi-equalize clips collapse to one — p < 0.2%);
      3. ONE bilinear warp of the COMPOSED affine of every fired geometric
         op, in layer order.
    Per-pixel sampling (warp taps, LUT reads) is what costs on a TPU, so it
    runs once per clip instead of once per layer."""
    if isinstance(policy, str):
        policy = DeviceAugmentPolicy.parse(policy)
    if video_u8.dtype != jnp.uint8:
        raise TypeError(
            f"device augment expects uint8 frames, got {video_u8.dtype} "
            "(is the host pipeline already normalizing?)")
    B, F, H, W, C = video_u8.shape
    op_idx, fire, level, neg = sample_policy(key, B, policy)
    x = video_u8.transpose(0, 1, 4, 2, 3)       # → channel-major (layout
    # contract above; one transpose pair for the whole policy)
    eq_any = jnp.zeros((B,), bool)
    mats = []
    for layer in range(policy.num_layers):      # unrolled: N is static
        o, fi, lv, ng = (op_idx[:, layer], fire[:, layer],
                         level[:, layer], neg[:, layer])
        x = _value_layer_cm(x, o, fi, lv, ng, policy)
        eq_any = eq_any | (fi & (o == _OP["Equalize"]))
        mats.append(_affine_matrices(o, fi, lv, ng, H, W))
    x = _equalize_apply_cm(x, eq_any, policy)
    x = _warp_affine_cm(x, compose_affine(jnp.stack(mats, axis=1)))
    return x.transpose(0, 1, 3, 4, 2)


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

"""Fused ResNet stem (7x7/2 conv + affine + relu + 3x3/2 maxpool) as one
Pallas TPU kernel.

Motivation (round-3 per-stage profile, VALIDATION.md): the stem is the one
piece of the flagship forward that runs far from any roofline — 13.4 ms of
the 121.5 ms batch-32 inference at ~12 TFLOPS, because XLA's 7x7 conv over
3 input channels wastes most of each MXU pass (contraction depth 3) and the
conv1 output (1.1 GB at B=32 bf16) round-trips HBM just to be max-pooled.
The MLPerf space-to-depth reformulation via XLA was measured SLOWER
(resnet.py NOTE); this kernel is the other path that note pointed at.

Counterpart of the reference stem (detectron2 BasicStem used by
slender_det's ResNet, `slender_det/configs` MODEL.RESNETS.STEM_OUT_CHANNELS)
— the fusion itself has no reference counterpart.

Design (TPU-first, not a translation):
- The image is pre-arranged OUTSIDE the kernel (one XLA relayout) into a
  channel-plane-major pair table P = (B, 6, rows, Wp+4): plane p*3+c holds
  channel c of x-phase p (x = 2*pair + phase), with 2 zero pairs of x
  padding and 7/9 zero rows so every tap the kernel reads is either real
  or exactly the conv's zero padding.
- Per 2 consecutive conv-output rows ("group"), the 7x7x3 conv becomes ONE
  matmul: A (192, Wp+4) is an im2col built from 21 sublane slices of 4
  lane-rolled copies of the DMA'd row window (roll d = -2..1 covers the 7
  kx taps across the 2 x-phases), and W' (192, 2*Cs) stacks the two rows'
  weights over a shared 9-raw-row K so N = 2*Cs = 128 fills the MXU and
  the contraction K = 192 sits on sublanes (granularity 8, no 128-lane
  padding). The affine (FrozenBN) scale is folded into W'; bias is added
  in the fp32 epilogue.
- relu + 3x3/2 maxpool run in the epilogue: pool-x as a sublane
  roll-max + pairwise reshape-max, pool-y by carrying the previous group's
  second conv row; pool padding uses zeros, which after relu is exactly
  max-pool's -inf padding (every window contains a real value >= 0).
- Only the pooled (B, H/4, W/4, Cs) output ever leaves the chip: HBM
  traffic is read-P + write-pooled (~0.5 GB at B=32) instead of XLA's
  ~2.7 GB, and the MXU sees K=192/N=128 instead of K=3.
- Gradients: `jax.custom_vjp` differentiating the plain-XLA composition
  (the stem is frozen under MODEL.BACKBONE.FREEZE_AT>=1 anyway).

MEASURED RESULT (v5e single chip, tools/stem_probe.py, B=32 800x1344 bf16):
the kernel LOSES to XLA — 15.9 ms vs 14.3 ms (0.90x). Ablation probes
localized the cost: the 4 lane-rolled copies are ~0.4 ms and the 21-slice
im2col ~0.9 ms; even with BOTH replaced by a contiguous dummy load the
kernel floor is 15.1 ms — i.e. the serialized per-group (dot -> fp32 pool
epilogue) structure itself is the bottleneck, not the shuffles. A bf16
epilogue variant (cast after relu; exact, since max commutes with monotone
rounding and the XLA path also pools post-cast) was BLOCKED by Mosaic
("Rotate with non-32-bit data"); replacing the pool-x rotate with offset
slices compiled but relayouts made it 18.5 ms (0.77x). CONCLUSION: XLA's
own stem lowering is already near this formulation's ceiling; the kernel
is kept (oracle-tested, MODEL.RESNETS.FUSED_STEM, default OFF) as the
record of the experiment. Do not wire it without a new design that breaks
the 15 ms dot/epilogue floor (e.g. multi-group M-batched dots).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# kx tap -> (lane shift d, x phase): raw x = 2*x_out + kx - 3 = 2*(x_out+d)+ph
_KX_TO_DPH = ((-2, 1), (-1, 0), (-1, 1), (0, 0), (0, 1), (1, 0), (1, 1))
_SHIFTS = (-2, -1, 0, 1)
_K = 192          # 7 kx * 3 c * 9 raw rows = 189, padded to a sublane mult.
_TG_CANDIDATES = (28, 24, 20, 16, 12, 8, 4)


def _pick_tg(groups: int):
    for tg in _TG_CANDIDATES:
        if groups % tg == 0:
            return tg
    return None


def _pack_weight(w, scale, dtype):
    """(7,7,3,Cs) stem kernel + per-channel scale -> W' (192, 2*Cs).

    K index k = kx*27 + c*9 + r, where r indexes the 9 raw rows a 2-row
    group reads; output column o*Cs+ch is conv row (y + o), whose tap ky
    sits at r = ky + 2*o."""
    cs = w.shape[-1]
    wf = (w.astype(jnp.float32) * scale.astype(jnp.float32))
    wt = jnp.transpose(wf, (1, 2, 0, 3))                 # (kx, c, ky, Cs)
    w0 = jnp.pad(wt, ((0, 0), (0, 0), (0, 2), (0, 0)))   # row o=0: r = ky
    w1 = jnp.pad(wt, ((0, 0), (0, 0), (2, 0), (0, 0)))   # row o=1: r = ky+2
    wp = jnp.concatenate([w0, w1], axis=-1).reshape(189, 2 * cs)
    return jnp.pad(wp, ((0, _K - 189), (0, 0))).astype(dtype)


def _prep_input(x, rw_last: int, lp: int):
    """(B, H, W, 3) -> P (B, 6, H+16, lp) channel-plane-major pairs.

    P[b, ph*3+c, r+7, p+2] = x[b, r, 2p+ph, c]; everything else zero. The
    7 top / 9 bottom zero rows and >=2 zero pairs per side make every kernel
    tap either a real pixel or the conv's zero padding, and let the lane
    rolls wrap harmlessly (wrapped lanes land in / come from zero pairs).
    lp is 128-aligned: Mosaic rejects HBM memref slices whose minor dim is
    not a lane-tile multiple."""
    b, h, w, _ = x.shape
    xr = x.reshape(b, h, w // 2, 6)
    p = jnp.transpose(xr, (0, 3, 1, 2))                  # (B, 6, H, Wp)
    bottom = rw_last - h - 7
    return jnp.pad(p, ((0, 0), (0, 0), (7, bottom), (2, lp - w // 2 - 2)))


def _make_kernel(TG: int, RW: int, Lp: int, cs: int, wc: int, wpool: int,
                 dtype):
    """All shapes static. Grid = (B, groups // TG); one grid step produces
    TG pooled output rows (pooled row p == group index g)."""
    n2 = 2 * cs

    def kernel(p_ref, w_ref, b2_ref, out_ref, vbuf, var, sem):
        b = pl.program_id(0)
        i = pl.program_id(1)

        # Row window covering groups (g0-1)..(g0+TG-1): P rows [4*g0, +RW).
        dma = pltpu.make_async_copy(
            p_ref.at[b, :, pl.ds(i * (4 * TG), RW)], vbuf, sem)
        dma.start()
        dma.wait()

        # 4 lane-rolled copies, stored in the INPUT dtype: Mosaic only
        # implements lane rotates at 32 bit, so roll in fp32, but cast the
        # stored copy back to dtype — the dot consumes dtype anyway, so this
        # is bit-identical while halving the per-group im2col traffic for
        # bf16. V[di][plane][l, L] = Praw[plane][l, L+d].
        vf = vbuf[:].astype(jnp.float32)
        for di, d in enumerate(_SHIFTS):
            r = vf if d == 0 else pltpu.roll(vf, (-d) % Lp, axis=2)
            var[di] = r.astype(vbuf.dtype)

        # Static mask on the matmul output (sublane = x_out + 2): the conv
        # output is x_out in [0, wc); columns outside (x=-1 in particular,
        # which pool-x's left edge reads) are maxpool padding and must be
        # zero — after relu, zero padding is exactly max-pool's -inf.
        sub = lax.broadcasted_iota(jnp.int32, (Lp, n2), 0)
        xvalid = (sub >= 2) & (sub < wc + 2)

        bias2 = b2_ref[:].astype(jnp.float32)  # (1, 2*Cs)

        prev2 = jnp.zeros((wpool, cs), jnp.float32)
        for gg in range(-1, TG):
            # ---- im2col: 21 sublane slices -> A (192, Lp)
            base = 4 * gg + 4
            rows = []
            for kx in range(7):
                d, ph = _KX_TO_DPH[kx]
                di = _SHIFTS.index(d)
                for c in range(3):
                    rows.append(var[di, ph * 3 + c, base:base + 9, :])
            rows.append(jnp.zeros((_K - 189, Lp), dtype))
            a = jnp.concatenate(rows, axis=0)

            # ---- conv rows (2g, 2g+1) in one MXU pass: (Lp, 2*Cs)
            acc = lax.dot_general(
                a, w_ref[:],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bias2
            v = jnp.where(xvalid, jnp.maximum(acc, 0.0), 0.0)

            # ---- pool-x: m2[s] = max(v[s-1], v[s]); pooled q = x pair
            # (2q, 2q+1) -> max(m2[2q+2], m2[2q+3]) via pairwise reshape.
            m2 = jnp.maximum(v, pltpu.roll(v, 1, axis=0))
            px = jnp.max(
                m2[2:2 + 2 * wpool].reshape(wpool, 2, n2), axis=1)

            if gg == -1:
                # Group g0-1 only contributes its second conv row (2*g0-1)
                # to pooled row g0; for the first tile that row is the
                # pool's zero padding.
                prev2 = jnp.where(i > 0, px[:, cs:], 0.0)
                continue

            # ---- pool-y: pooled row g <- conv rows (2g-1, 2g, 2g+1)
            pooled = jnp.maximum(prev2, jnp.maximum(px[:, :cs], px[:, cs:]))
            prev2 = px[:, cs:]
            out_ref[0, gg, :, :] = pooled.astype(dtype)

    return kernel


_VMEM_LIMIT = 100 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_forward(x, w, scale, bias, interpret=False):
    b, h, wdt, cin = x.shape
    cs = w.shape[-1]
    groups = h // 4
    TG = _pick_tg(groups)
    wc = wdt // 2
    lp = -(-(wc + 4) // 128) * 128
    wpool = wdt // 4
    RW = 4 * TG + 16

    p = _prep_input(x, 4 * (groups - TG) + RW, lp)
    wpk = _pack_weight(w, scale, x.dtype)
    bias2 = jnp.concatenate([bias, bias]).reshape(1, 2 * cs)

    kernel = _make_kernel(TG, RW, lp, cs, wc, wpool, x.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(b, groups // TG),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),           # P stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),       # W'
            pl.BlockSpec(memory_space=pltpu.VMEM),       # bias2
        ],
        out_specs=pl.BlockSpec(
            (1, TG, wpool, cs), lambda bb, ii: (bb, ii, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, groups, wpool, cs), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((6, RW, lp), x.dtype),            # DMA'd row window
            pltpu.VMEM((4, 6, RW, lp), x.dtype),         # lane-rolled copies
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (h // 2) * wc * _K * cs * 2,
            bytes_accessed=p.size * p.dtype.itemsize
            + b * groups * wpool * cs * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(p, wpk, bias2)
    return out


def stem_eligible(x_shape, w_shape) -> bool:
    """Static gate for the fused path (callers fall back to XLA otherwise)."""
    _, h, wdt, cin = x_shape
    if cin != 3 or w_shape[:3] != (7, 7, 3) or 2 * w_shape[-1] > 256:
        return False
    if h % 4 or wdt % 4 or _pick_tg(h // 4) is None:
        return False
    return h >= 16 and wdt >= 16


def reference_stem(x, w, scale, bias):
    """Plain-XLA composition with identical semantics (oracle + backward):
    relu(conv7x7/2(x) * scale + bias) -> maxpool 3x3/2. The affine scale is
    folded into the conv weight exactly as the kernel folds it."""
    dn = lax.conv_dimension_numbers(x.shape, (7, 7, 3, w.shape[-1]),
                                    ("NHWC", "HWIO", "NHWC"))
    wf = (w.astype(jnp.float32) * scale.astype(jnp.float32)).astype(x.dtype)
    y = lax.conv_general_dilated(
        x, wf, (2, 2), ((3, 3), (3, 3)), dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    y = jnp.maximum(y + bias.astype(jnp.float32), 0.0).astype(x.dtype)
    return lax.reduce_window(
        y, jnp.array(-jnp.inf, y.dtype), lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))


@jax.custom_vjp
def fused_stem(x, w, scale, bias):
    """Fused stem forward: maxpool3x3/2(relu(affine(conv7x7/2(x)))).

    x (B, H, W, 3) with H, W % 4 == 0; w (7, 7, 3, Cs) fp32; scale/bias
    (Cs,) the FrozenBN affine. Returns (B, H/4, W/4, Cs) in x.dtype.
    Backward differentiates the XLA composition (see module docstring)."""
    interpret = jax.default_backend() == "cpu"
    return _fused_forward(x, w, scale, bias, interpret=interpret)


def _fwd(x, w, scale, bias):
    return fused_stem(x, w, scale, bias), (x, w, scale, bias)


def _bwd(res, g):
    x, w, scale, bias = res
    _, vjp = jax.vjp(reference_stem, x, w, scale, bias)
    return vjp(g)


fused_stem.defvjp(_fwd, _bwd)

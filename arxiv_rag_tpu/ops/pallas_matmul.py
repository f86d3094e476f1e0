"""Pallas TPU kernel: W8A8 dense matmul for the encoder hot path.

The MPNet encoder is MXU-limited (~366K tok/s bf16; attention memory is
not the bottleneck — throughput is flat from seq 128 to 384).  v5e's MXU
executes s8xs8->s32 at twice the bf16 MAC rate, but XLA lowers the
encoder's int8 dots (``models/mpnet.py::_dense_int8``) through a
conversion path that measured throughput-neutral vs bf16 (CLAUDE.md
round-2 note).  This kernel forces an explicit int8 contraction:

MEASURED NEGATIVE RESULT (2026-08-16, v5e, interleaved A/B, full
all-mpnet-base-v2 512x128 bf16): bf16 2682 / w8a8-XLA 2623 /
w8a8-Pallas-fused-quant 2021 chunks/s — the Pallas route is a
consistent ~25% LOSS, and XLA int8 is neutral.  Mosaic does not hit
the double-rate s8 MXU path for these (K=768/3072) shapes, and every
pallas_call boundary forfeits XLA fusion of the surrounding
LayerNorm/GELU/residual elementwise work.  The kernel therefore ships
DEFAULT-OFF (``ARAG_W8A8_PALLAS=1`` to opt in); bench.py keeps a
deadline-gated phase so a future libtpu/Mosaic that lowers s8s8 to the
double-rate path shows up in the round logs.  Kernel design below kept
for that future:

- operands stay int8 end to end: x_q [M, K] (per-row dynamically
  quantized activations), w_q [K, N] (per-output-channel statically
  quantized weights);
- one ``dot_general`` per (m, n) grid step with
  ``preferred_element_type=int32`` — the whole reduction (K <= 4096
  fits VMEM at these shapes: K is 768 or 3072 for MPNet) runs inside
  the MXU with s32 accumulation, no partial-sum traffic;
- dequantization (acc * a_scale * w_scale + bias) is fused into the
  same kernel on the VPU, so the s32 accumulator never touches HBM;
- grid is (M/bm, N/bn) with the n axis innermost: the x tile's
  BlockSpec is constant across n, so each activation tile is fetched
  once and re-used against every weight column block while resident
  in VMEM.

Role parity: this is the throughput stage the reference delegates to
torch's quantized/cpu kernels via N worker processes
(``generate_embeddings_parallel.py:131-169``); here it is one SPMD
kernel under the same jit as the rest of the forward pass.

Exactness: integer matmul is exact, and the dequant applies the same
operations in the same order as the XLA path, so interpret-mode output
matches ``_dense_int8`` bitwise in fp32 (tests/test_pallas_matmul.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_FULL_K = 4096  # full-K blocks: MPNet K is 768/3072; guard the rest


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def pallas_w8a8_enabled() -> bool:
    """Route ``_dense_int8`` through this kernel?  ``ARAG_W8A8_PALLAS=1``
    forces on, ``0`` forces off; unset defaults to off until the TPU
    measurement (bench.py encoder phase) justifies flipping it."""
    v = os.environ.get("ARAG_W8A8_PALLAS", "")
    if v in ("1", "true", "on"):
        return True
    return False


def _w8a8_kernel(x_ref, w_ref, as_ref, ws_ref, b_ref, o_ref):
    # s8 x s8 -> s32 on the MXU (double the bf16 MAC rate on v5e+)
    acc = jax.lax.dot_general(
        x_ref[:],
        w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # dequant fused on the VPU; same op order as the XLA reference path
    # (_dense_int8: y * a_scale * kscale + bias) for bitwise parity
    y = acc.astype(jnp.float32) * as_ref[:] * ws_ref[:]
    o_ref[:] = (y + b_ref[:]).astype(o_ref.dtype)


def _w8a8_fq_kernel(x_ref, w_ref, ws_ref, b_ref, o_ref, xq_ref, as_ref):
    """Fused-quant variant: activations arrive bf16/f32 and are quantized
    per-row INSIDE the kernel into VMEM scratch on the first n-tile, then
    re-used for every weight column block.  This keeps the int8
    activations out of HBM entirely — the measured failure mode of the
    pre-quantized route at encoder scale (M=65536: the extra int8
    write+read per dense layer cost ~20% end-to-end vs bf16)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _quantize():
        a32 = x_ref[:].astype(jnp.float32)
        a_scale = jnp.max(jnp.abs(a32), axis=-1, keepdims=True) / 127.0
        a_scale = jnp.maximum(a_scale, 1e-8)
        xq_ref[:] = jnp.round(a32 / a_scale).astype(jnp.int8)
        as_ref[:] = a_scale

    acc = jax.lax.dot_general(
        xq_ref[:],
        w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * as_ref[:] * ws_ref[:]
    o_ref[:] = (y + b_ref[:]).astype(o_ref.dtype)


def _pick_block_m(m: int, k: int, fused_quant: bool = False) -> int:
    """Activation-tile height: big tiles amortize weight re-streaming
    ((M/bm) * K * N bytes total), bounded by VMEM (x tile is bm*K int8,
    double-buffered). 1024x3072 int8 = 3 MB/buffer is the ceiling.

    The fused-quant variant is hungrier per row: the bf16 x tile
    (double-buffered), the int8 scratch, AND the fp32 cast temp the
    quantize step materializes — ~9 bytes/element, so the tile must
    shrink (measured: 512x3072 fused-quant overflows scoped VMEM by
    1.56 MB on v5e)."""
    if fused_quant:
        cap = 32
        for bm in (1024, 512, 256, 128, 64):
            if bm * k * 9 <= 9_000_000:
                cap = bm
                break
    else:
        cap = 1024 if k <= 1024 else 512
    if m >= cap:
        return cap
    return max(32, ((m + 31) // 32) * 32)  # int8 sublane tile is 32


def _pick_block_n(n: int) -> int:
    for bn in (512, 256, 128):
        if n % bn == 0:
            return bn
    return n


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "out_dtype", "interpret"))
def _w8a8_jit(x_q, a_scale, w_q, w_scale, bias, block_m, block_n, out_dtype, interpret):
    m, k = x_q.shape
    n = w_q.shape[1]
    grid = (m // block_m, n // block_n)  # n innermost: x tile resident
    return pl.pallas_call(
        _w8a8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_m, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=m * k + (m // block_m) * k * n + m * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_q, w_q, a_scale, w_scale, bias)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "out_dtype", "interpret"))
def _w8a8_fq_jit(x, w_q, w_scale, bias, block_m, block_n, out_dtype, interpret):
    m, k = x.shape
    n = w_q.shape[1]
    grid = (m // block_m, n // block_n)
    return pl.pallas_call(
        _w8a8_fq_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_m, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((block_m, k), jnp.int8),
            pltpu.VMEM((block_m, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=m * k * 2 + (m // block_m) * k * n + m * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w_q, w_scale, bias)


def w8a8_matmul_fused_quant(
    x: jnp.ndarray,
    w_q: jnp.ndarray,
    w_scale: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    *,
    out_dtype: jnp.dtype = jnp.float32,
    block_m: int | None = None,
    block_n: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """W8A8 matmul with per-row activation quantization fused into the
    kernel: x [M, K] bf16/f32 in, int8 math on the MXU, dequant + bias
    out.  Semantics match quantize-then-``w8a8_matmul`` exactly (same
    absmax/127 scale, same round-half-even)."""
    if interpret is None:
        interpret = _interpret_default()
    m, k = x.shape
    kw, n = w_q.shape
    if k != kw:
        raise ValueError(f"contraction mismatch: x K={k}, w K={kw}")
    if k > _MAX_FULL_K:
        raise ValueError(f"K={k} exceeds the full-K VMEM budget ({_MAX_FULL_K})")
    if k % 128 or n % 128:
        raise ValueError(f"K and N must be multiples of 128 (got K={k}, N={n})")
    if block_m is None:
        block_m = _pick_block_m(m, k, fused_quant=True)
    if block_n is None:
        block_n = _pick_block_n(n)
    w_scale = jnp.asarray(w_scale, jnp.float32).reshape(1, n)
    if bias is None:
        bias = jnp.zeros((1, n), jnp.float32)
    bias = jnp.asarray(bias, jnp.float32).reshape(1, n)
    pad = (-m) % block_m
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    out = _w8a8_fq_jit(x, w_q, w_scale, bias, block_m, block_n,
                       jnp.dtype(out_dtype), interpret)
    return out[:m]


def w8a8_matmul(
    x_q: jnp.ndarray,
    a_scale: jnp.ndarray,
    w_q: jnp.ndarray,
    w_scale: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    *,
    out_dtype: jnp.dtype = jnp.float32,
    block_m: int | None = None,
    block_n: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused int8 matmul + dequant: ``(x_q @ w_q) * a_scale * w_scale + bias``.

    x_q [M, K] int8, a_scale [M] or [M, 1] fp32; w_q [K, N] int8,
    w_scale [N] or [1, N] fp32; bias [N] fp32 (zeros if None).
    Returns [M, N] in ``out_dtype``.  M is padded internally to the
    activation-tile height; K and N must already be lane-tiled
    (multiples of 128 — true for every MPNet projection).
    """
    if interpret is None:
        interpret = _interpret_default()
    m, k = x_q.shape
    kw, n = w_q.shape
    if k != kw:
        raise ValueError(f"contraction mismatch: x K={k}, w K={kw}")
    if k > _MAX_FULL_K:
        raise ValueError(f"K={k} exceeds the full-K VMEM budget ({_MAX_FULL_K})")
    if k % 128 or n % 128:
        raise ValueError(f"K and N must be multiples of 128 (got K={k}, N={n})")
    if block_m is None:
        block_m = _pick_block_m(m, k)
    if block_n is None:
        block_n = _pick_block_n(n)
    a_scale = jnp.asarray(a_scale, jnp.float32).reshape(m, 1)
    w_scale = jnp.asarray(w_scale, jnp.float32).reshape(1, n)
    if bias is None:
        bias = jnp.zeros((1, n), jnp.float32)
    bias = jnp.asarray(bias, jnp.float32).reshape(1, n)
    pad = (-m) % block_m
    if pad:
        x_q = jnp.pad(x_q, ((0, pad), (0, 0)))
        a_scale = jnp.pad(a_scale, ((0, pad), (0, 0)))
    out = _w8a8_jit(
        x_q, a_scale, w_q, w_scale, bias,
        block_m, block_n, jnp.dtype(out_dtype), interpret,
    )
    return out[:m]


def w8a8_dense(
    x: jnp.ndarray,
    p: dict,
    *,
    out_dtype: jnp.dtype,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Apply a quantized dense layer (``quantize_params_int8`` leaf dict
    with kernel_q [K, N] / kscale [1, N] / bias [N]) to UNQUANTIZED
    activations of any leading shape: [..., K] -> [..., N].  Activation
    quantization happens inside the kernel (fused-quant variant), so the
    int8 activations never round-trip through HBM."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = p["kernel_q"].shape[-1]
    y = w8a8_matmul_fused_quant(
        x.reshape(-1, k),
        p["kernel_q"],
        p["kscale"].reshape(1, n),
        jnp.asarray(p["bias"], jnp.float32).reshape(1, n),
        out_dtype=out_dtype,
        interpret=interpret,
    )
    return y.reshape(*lead, n)

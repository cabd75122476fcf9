"""Pallas TPU kernels for the KFAC hot path.

The dominant HBM cost of a conv KFAC factor build is the materialized patch
tensor: ``[B, out_positions, C_in * prod(K)]`` (1.2 GiB for one 64-channel
3x3 layer of ResNet-18 at batch 512 / fp32) that XLA's
``conv_general_dilated_patches`` writes out before the covariance einsum
reads it back. :func:`conv_input_covariance` fuses patch extraction and the
covariance accumulation into one Pallas kernel: the grid walks batch tiles,
each step builds its patch block in VMEM from the raw input tile and
accumulates ``P^T P`` on the MXU into a VMEM-resident ``[d_in, d_in]``
accumulator — the input is read from HBM exactly once and the patch tensor
never exists.

Applicable when the covariance (and one image's patch block) fit VMEM
(``d_in = C*prod(K) <= ~1200``); callers fall back to the XLA path otherwise
(see ``KFACComputer``'s ``use_pallas`` switch).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# covariance + one image's patch block must fit VMEM (~16 MiB/core)
MAX_PALLAS_D_IN = 1200


def _normalize_conv_geometry(x_shape, meta) -> dict | None:
    """Static conv geometry for the kernel; ``None`` if unsupported."""
    dn = meta["dimension_numbers"]
    # NHWC input / HWIO-equivalent access handled via explicit transposes by
    # the caller; here we require 2 spatial dims and no dilation
    if len(dn.lhs_spec) != 4:
        return None
    if any(d != 1 for d in meta["lhs_dilation"] + meta["rhs_dilation"]):
        return None
    if meta["feature_group_count"] != 1 or meta["batch_group_count"] != 1:
        return None
    if any(p < 0 for pair in meta["padding"] for p in pair):
        # cropping (negative padding) can't be expressed by the kernel's
        # jnp.pad pre-step; the XLA patches path handles it natively
        return None
    b_dim, c_dim = dn.lhs_spec[0], dn.lhs_spec[1]
    spatial = dn.lhs_spec[2:]
    kh, kw = (meta["w_shape"][d] for d in dn.rhs_spec[2:])
    (ph0, ph1), (pw0, pw1) = meta["padding"]
    sh, sw = meta["window_strides"]
    H, W = x_shape[spatial[0]], x_shape[spatial[1]]
    Ho = (H + ph0 + ph1 - kh) // sh + 1
    Wo = (W + pw0 + pw1 - kw) // sw + 1
    C = x_shape[c_dim]
    d_in = C * kh * kw
    return dict(
        b_dim=b_dim, c_dim=c_dim, spatial=spatial,
        kh=kh, kw=kw, sh=sh, sw=sw,
        pads=((ph0, ph1), (pw0, pw1)),
        H=H, W=W, Ho=Ho, Wo=Wo, C=C, d_in=d_in,
        B=x_shape[b_dim],
    )


def pallas_conv_cov_supported(x_shape, meta, bias_pad) -> bool:
    """Whether the fused Pallas kernel handles this conv's geometry.

    The fusion pays off for the memory-heavy backbone convolutions (small
    kernels, >= 16 channels): the block-pair accumulation issues
    ``prod(K)^2`` MXU matmuls of ``[C, C]``, so degenerate first-layer
    geometries (RGB input, 7x7 kernels) stay on the cheap XLA patches path.
    """
    geo = _normalize_conv_geometry(x_shape, meta)
    if geo is None:
        return False
    if geo["kh"] * geo["kw"] > 9 or geo["C"] < 16 or geo["C"] % 8 != 0:
        return False
    d = geo["d_in"] + (1 if bias_pad is not None else 0)
    return d <= MAX_PALLAS_D_IN


def conv_input_covariance(
    x: jax.Array, meta: dict, bias_pad: float | None = None, interpret: bool = False
) -> tuple[jax.Array, int]:
    """Fused unnormalized patch covariance ``sum_{b,s} a a^T`` and ``S``.

    Args:
        x: Conv layer input (any 4D layout described by ``meta``).
        meta: Conv metadata from the jaxpr collector.
        bias_pad: Append a constant column (1.0 has-bias / 0.0 padded) for
            joint weight+bias groups.
        interpret: Run the kernel in interpreter mode (CPU testing).

    Returns:
        ``(cov [d, d], S)`` with ``d = KH*KW*C (+1)`` in the canonical
        kernel-offset-major, channel-minor ``(KH, KW, C)`` feature order
        (matching ``canonical_conv_weight`` / ``extract_conv_patches``) and
        ``S = Ho*Wo`` sharing positions.
    """
    geo = _normalize_conv_geometry(x.shape, meta)
    if geo is None:
        raise ValueError("Unsupported conv geometry for the Pallas kernel.")

    # normalize the input to NHWC
    perm = (geo["b_dim"], geo["spatial"][0], geo["spatial"][1], geo["c_dim"])
    x = jnp.transpose(x, perm)
    B, H, W, C = x.shape
    kh, kw, sh, sw = geo["kh"], geo["kw"], geo["sh"], geo["sw"]
    (ph0, ph1), (pw0, pw1) = geo["pads"]
    Ho, Wo = geo["Ho"], geo["Wo"]
    S = Ho * Wo
    d = geo["d_in"] + (1 if bias_pad is not None else 0)
    pad_val = None if bias_pad is None else float(bias_pad)

    n_offsets = kh * kw

    def kernel(x_ref, out_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            out_ref[:] = jnp.zeros((d, d), jnp.float32)

        img = x_ref[0]  # [H, W, C] for this grid step
        # extra (stride-1) tail padding lets strided sampling be expressed as
        # stride-1 slice + reshape-subsample (Mosaic rejects strided slices)
        img = jnp.pad(img, ((ph0, ph1 + sh - 1), (pw0, pw1 + sw - 1), (0, 0)))
        cols = []
        for i in range(kh):
            for j in range(kw):
                v = jax.lax.slice(
                    img, (i, j, 0), (i + sh * Ho, j + sw * Wo, C)
                )
                if sh > 1 or sw > 1:
                    v = v.reshape(Ho, sh, Wo, sw, C)[:, 0, :, 0, :]
                cols.append(v.reshape(S, C))  # [S, C] per kernel offset

        # canonical (*K, C) layout: the covariance is a grid of [C, C]
        # blocks, one per kernel-offset pair — contiguous static-slice
        # writes, no VMEM reshapes/concats (Mosaic-friendly)
        for k1 in range(n_offsets):
            for k2 in range(n_offsets):
                block = jnp.dot(
                    cols[k1].T, cols[k2], preferred_element_type=jnp.float32
                )
                out_ref[k1 * C : (k1 + 1) * C, k2 * C : (k2 + 1) * C] += block
        if pad_val is not None:
            ones = jnp.full((S, 1), pad_val, img.dtype)
            for k1 in range(n_offsets):
                cross = jnp.dot(
                    cols[k1].T, ones, preferred_element_type=jnp.float32
                )
                out_ref[k1 * C : (k1 + 1) * C, d - 1 : d] += cross
                out_ref[d - 1 : d, k1 * C : (k1 + 1) * C] += cross.T
            out_ref[d - 1 : d, d - 1 : d] += jnp.full(
                (1, 1), pad_val * pad_val * S, jnp.float32
            )

    cov = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, d), lambda b: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(x)
    return cov.astype(x.dtype), S

"""Weight-sharing-format math for KFAC factor computation.

Counterpart of the reference's ``computers/kfac_math.py`` +
``kfac_utils.extract_patches`` (``kfac_utils.py:78-180``): every supported
layer is normalized to ``output[b, s] = W @ input[b, s] (+ bias)`` in the
**weight-sharing format** ``[batch, shared, features]``:

- dense inputs ``[B, *share, d_in]`` flatten the sharing dims (EXPAND) or
  average them (REDUCE);
- conv inputs are unfolded with ``jax.lax.conv_general_dilated_patches`` — the
  TPU-native patch extraction, one XLA op instead of ``F.unfold`` — giving
  ``[B, out_positions, C_in * prod(kernel)]`` with ``(C, *kernel)`` feature
  ordering (the canonical conv weight is transposed to match);
- gradients flatten (EXPAND) or sum (REDUCE) the sharing dims.

Covariance scalings follow the reference exactly: ``aaT`` is divided by
``N_data * shared`` (``kfac_hooks.py:388-391``), ``ggT`` is multiplied by the
loss correction ``num_loss_terms^2 / (per_example_terms * N_data)`` for mean
reduction (``kfac_math.py:172-203``).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from curvlinops_tpu.curvature.loss_hessian import KFACType


def apply_weight_views(W: jax.Array, views) -> jax.Array:
    """Replay the transparent ops between a weight leaf and its layer operand.

    Some frameworks transform the stored parameter before the matmul (e.g.
    HuggingFace's GPT-2 Conv1D transposes its kernel); the jaxpr collector
    records the chain so the canonical converters see the operand layout.
    """
    for kind, arg, _in_shape in views:
        if kind == "transpose":
            W = jnp.transpose(W, arg)
        elif kind == "reshape":
            W = W.reshape(arg)
        elif kind == "convert":
            W = W.astype(arg)
        elif kind == "squeeze":
            W = jax.lax.squeeze(W, arg)
        else:
            raise ValueError(f"Non-invertible weight view {kind!r}.")
    return W


def invert_weight_views(W: jax.Array, views) -> jax.Array:
    """Inverse of :func:`apply_weight_views`."""
    for kind, arg, in_shape in reversed(views):
        if kind == "transpose":
            inv = [arg.index(d) for d in range(len(arg))]
            W = jnp.transpose(W, inv)
        elif kind in ("reshape", "squeeze"):
            W = W.reshape(in_shape)
        elif kind == "convert":
            pass  # dtype restored by the caller's parameter dtype
        else:
            raise ValueError(f"Non-invertible weight view {kind!r}.")
    return W


def canonical_dense_weight(W: jax.Array, meta: dict) -> jax.Array:
    """Reshape a dense weight leaf to canonical ``[d_out, d_in]``."""
    W = apply_weight_views(W, meta.get("w_views", ()))
    perm = meta["w_free"] + meta["w_contract"]
    return jnp.transpose(W, perm).reshape(meta["d_out"], meta["d_in"])


def canonical_dense_weight_inverse(
    W_canon: jax.Array, meta: dict, shape: tuple
) -> jax.Array:
    """Inverse of :func:`canonical_dense_weight` (back to the LEAF layout)."""
    op_shape = meta.get("w_operand_shape", shape)
    perm = meta["w_free"] + meta["w_contract"]
    inv_perm = [perm.index(d) for d in range(len(op_shape))]
    permuted_shape = [op_shape[d] for d in perm]
    W_op = jnp.transpose(W_canon.reshape(permuted_shape), inv_perm)
    return invert_weight_views(W_op, meta.get("w_views", ()))


def canonical_embedding_weight(W: jax.Array, meta: dict) -> jax.Array:
    """Reshape an embedding table ``[V, *emb]`` to canonical ``[d_out, V]``."""
    W = apply_weight_views(W, meta.get("w_views", ()))
    return W.reshape(W.shape[0], -1).T


def canonical_embedding_weight_inverse(
    W_canon: jax.Array, meta: dict, shape: tuple
) -> jax.Array:
    """Inverse of :func:`canonical_embedding_weight` (back to the LEAF layout)."""
    op_shape = meta.get("w_operand_shape", shape)
    W_op = W_canon.T.reshape(op_shape)
    return invert_weight_views(W_op, meta.get("w_views", ()))


def embedding_input_counts(idx: jax.Array, vocab: int, dtype) -> jax.Array:
    """Exact diagonal input covariance of an embedding lookup (un-normalized).

    One-hot inputs make ``aaT = sum_{b,s} onehot onehot^T`` exactly
    ``diag(token counts)`` — no ``[V, V]`` matrix is ever materialized
    (GPT-2's vocab would need 10 GiB). Counts accumulate in float32 (bf16
    would round past 256) and convert to the factor dtype at the end.
    """
    counts = jnp.zeros(vocab, jnp.float32).at[idx.reshape(-1)].add(1)
    return counts.astype(dtype)


def canonical_stacked_weight(W: jax.Array, kind: str, meta: dict) -> jax.Array:
    """Canonicalize a scan-stacked weight leaf to ``[L, d_out, d_in]``.

    Outer (pre-scan) views are convert-only by the collector's contract; the
    per-slice canonicalization maps over the leading scan axis.
    """
    W = apply_weight_views(W, meta.get("w_views_outer", ()))
    fn = canonical_dense_weight if kind == "dense" else canonical_conv_weight
    return jax.vmap(lambda w: fn(w, meta))(W)


def canonical_stacked_weight_inverse(
    W_canon: jax.Array, kind: str, meta: dict, leaf_shape: tuple
) -> jax.Array:
    """Inverse of :func:`canonical_stacked_weight` (back to the LEAF layout)."""
    fn = (
        canonical_dense_weight_inverse
        if kind == "dense"
        else canonical_conv_weight_inverse
    )
    W_op = jax.vmap(lambda w: fn(w, meta, leaf_shape[1:]))(W_canon)
    return invert_weight_views(W_op, meta.get("w_views_outer", ()))


def _conv_spatial_dims(meta: dict) -> tuple[int, tuple, int, int]:
    """(num_spatial, kernel_shape, rhs I dim, rhs O dim) from conv metadata."""
    dn = meta["dimension_numbers"]
    rhs_spec = dn.rhs_spec  # (O, I, *spatial) positions
    w_shape = meta["w_shape"]
    o_dim, i_dim = rhs_spec[0], rhs_spec[1]
    spatial_dims = rhs_spec[2:]
    kernel_shape = tuple(w_shape[d] for d in spatial_dims)
    return len(spatial_dims), kernel_shape, i_dim, o_dim


def canonical_conv_weight(W: jax.Array, meta: dict) -> jax.Array:
    """Reshape a conv kernel to canonical ``[d_out, d_in]``, d_in = (*K, C).

    The (kernel-position-major, channel-minor) order matches both the
    reordered XLA patches and the Pallas fused covariance kernel's block
    layout (contiguous ``[C, C]`` blocks per kernel-offset pair).
    """
    W = apply_weight_views(W, meta.get("w_views", ()))
    dn = meta["dimension_numbers"]
    rhs_spec = dn.rhs_spec
    o_dim, i_dim = rhs_spec[0], rhs_spec[1]
    spatial = rhs_spec[2:]
    perm = (o_dim,) + tuple(spatial) + (i_dim,)
    Wp = jnp.transpose(W, perm)  # [O, *K, I]
    return Wp.reshape(Wp.shape[0], -1)


def canonical_conv_weight_inverse(
    W_canon: jax.Array, meta: dict, shape: tuple
) -> jax.Array:
    """Inverse of :func:`canonical_conv_weight` (back to the LEAF layout)."""
    op_shape = meta.get("w_operand_shape", meta["w_shape"])
    dn = meta["dimension_numbers"]
    rhs_spec = dn.rhs_spec
    o_dim, i_dim = rhs_spec[0], rhs_spec[1]
    spatial = rhs_spec[2:]
    perm = (o_dim,) + tuple(spatial) + (i_dim,)
    permuted_shape = [op_shape[d] for d in perm]
    inv_perm = [perm.index(d) for d in range(len(op_shape))]
    W_op = jnp.transpose(W_canon.reshape(permuted_shape), inv_perm)
    return invert_weight_views(W_op, meta.get("w_views", ()))


def extract_conv_patches(x: jax.Array, meta: dict) -> jax.Array:
    """Unfold a conv input to ``[B, S, d_in]`` (one XLA op, MXU-friendly).

    Grouped convolutions average the input over channel groups before patch
    extraction, matching the reference (``kfac_utils.py:117-121``).

    Raises:
        NotImplementedError: For batch-grouped convolutions.
    """
    if meta["batch_group_count"] != 1:
        raise NotImplementedError(
            "Batch-grouped convolutions are not supported by KFAC."
        )
    x = _group_average_channels(x, meta)
    _, kernel_shape, _, _ = _conv_spatial_dims(meta)
    dn = meta["dimension_numbers"]
    patches = jax.lax.conv_general_dilated_patches(
        x,
        filter_shape=kernel_shape,
        window_strides=meta["window_strides"],
        padding=meta["padding"],
        lhs_dilation=meta["lhs_dilation"],
        rhs_dilation=meta["rhs_dilation"],
        dimension_numbers=dn,
    )
    # move the feature dim (at out_spec channel position) last, flatten spatial
    out_spec = dn.out_spec
    c_pos, b_pos = out_spec[1], out_spec[0]
    patches = jnp.moveaxis(patches, (b_pos, c_pos), (0, patches.ndim - 1))
    B = patches.shape[0]
    patches = patches.reshape(B, -1, patches.shape[-1])
    # conv_general_dilated_patches emits (C, *K) features; reorder to the
    # canonical (*K, C) layout
    S = patches.shape[1]
    C = x.shape[meta["dimension_numbers"].lhs_spec[1]]
    prod_k = patches.shape[-1] // C
    patches = patches.reshape(B, S, C, prod_k)
    patches = jnp.swapaxes(patches, -1, -2).reshape(B, S, C * prod_k)
    return patches


# A/B switch (benchmarks/reduce_memory_ab.py): force REDUCE mode through the
# materializing [B, S, d_in] patch path instead of the averaged extraction
FORCE_MATERIALIZED_REDUCE = False


def _group_average_channels(x: jax.Array, meta: dict) -> jax.Array:
    """Average the input over channel groups (``kfac_utils.py:117-121``)."""
    groups = meta["feature_group_count"]
    if groups == 1:
        return x
    dn0 = meta["dimension_numbers"]
    c_dim = dn0.lhs_spec[1]
    C = x.shape[c_dim]
    cg = C // groups
    shape = list(x.shape)
    grouped_shape = shape[:c_dim] + [groups, cg] + shape[c_dim + 1 :]
    return jnp.mean(x.reshape(grouped_shape), axis=c_dim)


def extract_averaged_patches(x: jax.Array, meta: dict) -> jax.Array | None:
    """Location-averaged conv patches ``[B, 1, d_in]`` WITHOUT materializing
    the ``[B, S, d_in]`` patch tensor.

    REDUCE-mode KFAC only needs the per-sample mean over output locations of
    the unfolded input; materializing the patches first costs ``O(S * K)``
    extra HBM (~1.2 GiB on a ResNet-18 forward at B=512). Instead, for each
    kernel offset ``k`` the mean over locations is the mean of one strided
    slice of the (zero-padded) input — ``prod(K)`` cheap slice+reduce ops that
    XLA fuses, reading the input in place. Counterpart of the reference's
    tensor-network contraction (``kfac_utils.py:124-180``).

    Returns ``None`` for input-dilated (transposed) convolutions, where the
    caller falls back to the materializing path.
    """
    if meta["batch_group_count"] != 1:
        raise NotImplementedError(
            "Batch-grouped convolutions are not supported by KFAC."
        )
    if any(d != 1 for d in meta["lhs_dilation"]):
        return None
    if any(lo < 0 or hi < 0 for lo, hi in meta["padding"]):
        # negative padding (cropping) is valid in lax.conv_general_dilated
        # but not in jnp.pad; fall back to the materializing path, whose
        # conv_general_dilated_patches handles it natively
        return None
    x = _group_average_channels(x, meta)
    _, kernel_shape, _, _ = _conv_spatial_dims(meta)
    dn = meta["dimension_numbers"]
    lhs_spec = dn.lhs_spec
    # canonicalize to [B, C, *spatial]
    x = jnp.transpose(x, (lhs_spec[0], lhs_spec[1]) + tuple(lhs_spec[2:]))
    B, C = x.shape[0], x.shape[1]
    pad = meta["padding"]
    x = jnp.pad(x, ((0, 0), (0, 0)) + tuple((lo, hi) for lo, hi in pad))
    strides = meta["window_strides"]
    rhs_dil = meta["rhs_dilation"]
    n_spatial = len(kernel_shape)
    out_sizes = [
        (x.shape[2 + i] - (rhs_dil[i] * (kernel_shape[i] - 1) + 1))
        // strides[i]
        + 1
        for i in range(n_spatial)
    ]
    from itertools import product as _iproduct

    means = []
    for k_multi in _iproduct(*[range(k) for k in kernel_shape]):
        start = [k_multi[i] * rhs_dil[i] for i in range(n_spatial)]
        limit = [
            start[i] + (out_sizes[i] - 1) * strides[i] + 1
            for i in range(n_spatial)
        ]
        sl = jax.lax.slice(
            x,
            [0, 0, *start],
            [B, C, *limit],
            [1, 1, *strides],
        )
        means.append(jnp.mean(sl, axis=tuple(range(2, sl.ndim))))  # [B, C]
    # kernel-position-major, channel-minor — the canonical (*K, C) layout
    avg = jnp.stack(means, axis=1).reshape(B, 1, -1)
    return avg


def _input_bsd(x: jax.Array, kind: str, meta: dict) -> jax.Array:
    """One layer input to base sharing format ``[B, S, d_in]`` (no reduce/bias)."""
    if kind == "conv":
        return extract_conv_patches(x, meta)  # [B, S, d_in]
    # dense: contract dims -> trailing d_in, other dims -> sharing
    x_contract = meta["x_contract"]
    other = [d for d in range(x.ndim) if d not in x_contract and d != 0]
    x = jnp.transpose(x, (0, *other, *x_contract))
    return x.reshape(x.shape[0], -1, meta["d_in"])


def input_to_sharing_format(
    x: jax.Array,
    kind: str,
    meta: dict,
    kfac_approx: str,
    bias_pad: float | None = None,
) -> jax.Array:
    """Convert a layer input to ``[batch, shared, d_in (+1)]``.

    Scan layers (collector ``meta["scan"]``) arrive stacked ``[L, B, *in]``:

    - ``shared`` (scan-const weight): the scan axis is weight sharing, merged
      into the sharing axis -> ``[B, L*S, d_in]``;
    - ``stacked`` (scanned-over weight): each slice is an independent block,
      the scan axis stays leading -> ``[L, B, S, d_in]`` and all covariances
      batch over it.
    """
    scan = meta.get("scan")
    use_averaged = (
        not FORCE_MATERIALIZED_REDUCE
        and kfac_approx == KFACType.REDUCE
        and kind == "conv"
        and meta["batch_group_count"] == 1
        and all(d == 1 for d in meta["lhs_dilation"])
        and all(lo >= 0 and hi >= 0 for lo, hi in meta["padding"])
    )
    if use_averaged:
        # REDUCE only needs the location-averaged patches: compute them
        # directly from strided input slices, never materializing [B, S, d_in]
        if scan is None:
            x = extract_averaged_patches(x, meta)  # [B, 1, d_in]
        else:
            x = jax.vmap(lambda xl: extract_averaged_patches(xl, meta))(x)
            if scan["kind"] == "shared":
                # equal location counts per slice: mean of per-slice means
                # equals the mean over the merged sharing axis
                x = jnp.mean(x, axis=0)  # [B, 1, d_in]
    else:
        if scan is None:
            x = _input_bsd(x, kind, meta)
        else:
            x = jax.vmap(lambda xl: _input_bsd(xl, kind, meta))(x)  # [L,B,S,d]
            if scan["kind"] == "shared":
                L, B = x.shape[0], x.shape[1]
                x = jnp.moveaxis(x, 0, 1).reshape(B, -1, x.shape[-1])
        if kfac_approx == KFACType.REDUCE:
            x = jnp.mean(x, axis=-2, keepdims=True)

    if bias_pad is not None:
        pad = jnp.full((*x.shape[:-1], 1), bias_pad, x.dtype)
        x = jnp.concatenate([x, pad], axis=-1)
    return x


def input_covariance(
    x: jax.Array,
    kind: str,
    meta: dict,
    kfac_approx: str,
    bias_pad: float | None = None,
) -> tuple[jax.Array, int]:
    """Input covariance ``sum_{b,s} a a^T`` WITHOUT materializing the
    bias-padded sharing-format tensor.

    ``input_to_sharing_format(..., bias_pad=p)`` concatenates a constant
    column onto the ``[.., B, S, d_in]`` input, which costs a second
    tap/patch-sized HBM buffer just to feed the covariance einsum (the
    original stays live as a vjp residual; on the ViT KFAC build these
    pad copies sit at peak).  The padded covariance has a closed block
    form from the UNPADDED input::

        [[ sum a a^T,   p * colsum(a)],
         [ p*colsum^T,  p^2 * B * S  ]]

    matching the concat-then-einsum result exactly up to f32 reduction
    order (cross terms are ``sum a * p``, the corner is ``sum p^2``).

    Returns ``(cov [.., d(+1), d(+1)] float32, S)`` — f32 accumulation
    from bf16 inputs stays MXU-native (bf16 multiply, f32 accumulate),
    matching the einsum's ``preferred_element_type`` path.
    """
    a = input_to_sharing_format(x, kind, meta, kfac_approx, bias_pad=None)
    S = a.shape[-2]
    cov = (
        jnp.einsum("lbsi,lbsj->lij", a, a, preferred_element_type=jnp.float32)
        if a.ndim == 4
        else jnp.einsum("bsi,bsj->ij", a, a, preferred_element_type=jnp.float32)
    )
    if bias_pad is None:
        return cov, S
    n = a.shape[-3] * S  # B * S constant-column self-products
    r = jnp.sum(a, axis=(-3, -2), dtype=jnp.float32) * bias_pad
    corner = jnp.full(
        cov.shape[:-2] + (1, 1), float(bias_pad) ** 2 * n, jnp.float32
    )
    top = jnp.concatenate([cov, r[..., :, None]], axis=-1)
    bot = jnp.concatenate([r[..., None, :], corner], axis=-1)
    return jnp.concatenate([top, bot], axis=-2), S


def _grad_vbsd(g: jax.Array, kind: str, meta: dict) -> jax.Array:
    """Layer-output gradients ``[V, B, *out]`` to base ``[V, B, S, d_out]``."""
    if kind == "conv":
        dn = meta["dimension_numbers"]
        out_spec = dn.out_spec
        # g follows the conv output layout with 2 leading dims (V, then batch at
        # out_spec positions shifted by 1)
        b_pos, c_pos = out_spec[0] + 1, out_spec[1] + 1
        g = jnp.moveaxis(g, (b_pos, c_pos), (1, g.ndim - 1))
        V, B = g.shape[0], g.shape[1]
        return g.reshape(V, B, -1, g.shape[-1])
    # dense: output dims = [V, B, *share, d_out_dims...]; free dims of the
    # weight map to the trailing dims of the output
    V, B = g.shape[0], g.shape[1]
    return g.reshape(V, B, -1, meta["d_out"]) if g.ndim > 2 else g.reshape(
        V, B, 1, meta["d_out"]
    )


def grad_to_sharing_format(
    g: jax.Array, kind: str, meta: dict, kfac_approx: str
) -> jax.Array:
    """Convert layer-output gradients to sharing format.

    Returns ``[V, B, S, d_out]``, or ``[L, V, B, S, d_out]`` for stacked scan
    layers (whose incoming gradients are ``[V, L, B, *out]``).
    """
    scan = meta.get("scan")
    if scan is None:
        g = _grad_vbsd(g, kind, meta)
    else:
        # [V, L, B, *out]: map the base conversion over the scan axis
        g = jax.vmap(lambda gl: _grad_vbsd(gl, kind, meta), in_axes=1, out_axes=0)(
            g
        )  # [L, V, B, S, d]
        if scan["kind"] == "shared":
            L, V, B = g.shape[0], g.shape[1], g.shape[2]
            g = jnp.moveaxis(g, 0, 2).reshape(V, B, -1, g.shape[-1])

    if kfac_approx == KFACType.REDUCE:
        g = jnp.sum(g, axis=-2, keepdims=True)
    return g


def loss_correction(
    batch_size: int,
    num_per_example_loss_terms: int,
    reduction: str,
    n_data: int,
) -> float:
    """Gradient-covariance correction (``kfac_math.py:172-203``)."""
    if reduction == "sum":
        return 1.0
    num_loss_terms = batch_size * num_per_example_loss_terms
    return num_loss_terms**2 / (num_per_example_loss_terms * n_data)


def gradient_covariance(g: jax.Array, correction: float) -> jax.Array:
    """``ggT = correction * sum_{v,b,s} g g^T`` over sharing format grads.

    Stacked gradients ``[L, V, B, S, d]`` give batched ``[L, d, d]``.
    Accumulates in f32 regardless of the model dtype (bf16 inputs keep the
    MXU-native bf16-multiply/f32-accumulate shape; a bf16 sum of outer
    products would be lossy).
    """
    if g.ndim == 5:
        return correction * jnp.einsum(
            "lvbsi,lvbsj->lij", g, g, preferred_element_type=jnp.float32
        )
    return correction * jnp.einsum(
        "vbsi,vbsj->ij", g, g, preferred_element_type=jnp.float32
    )


def eigenvalue_correction_embedding(
    g: jax.Array, Q_g: jax.Array, idx: jax.Array, vocab: int
) -> jax.Array:
    r"""EKFAC corrected eigenvalues for an embedding group.

    The diagonal input covariance's eigenbasis is the identity, so
    ``lam[d, v] = sum_{vec,n} ( sum_s (Q_g^T g_{vec,n,s})[d] 1[idx_{n,s}=v] )^2``
    — a per-sample segment-sum over token ids instead of a dense rotation.

    Args:
        g: ``[V_vec, B, S, D1]`` output gradients (KFAC-scaled).
        Q_g: ``[D1, D1]`` eigenvectors of the gradient covariance.
        idx: wrapped token indices, ``[B, *share, 1]``.
        vocab: vocabulary size (canonical input dim).

    Returns:
        ``[D1, vocab]`` correction.
    """
    Vv, B, S, D1 = g.shape
    rot = jnp.einsum("id,vbsi->vbsd", Q_g, g)
    ids = idx.reshape(B, S) + vocab * jnp.arange(B)[:, None]
    seg = jax.ops.segment_sum(
        jnp.moveaxis(rot, 0, 2).reshape(B * S, Vv * D1),
        ids.reshape(-1),
        num_segments=B * vocab,
    ).reshape(B, vocab, Vv, D1)
    return jnp.einsum("bvad,bvad->dv", seg, seg)


def eigenvalue_correction(
    g: jax.Array,
    Q_g: jax.Array,
    a: jax.Array | None,
    Q_a: jax.Array | None,
    force_strategy: str | None = None,
) -> jax.Array:
    r"""EKFAC corrected eigenvalues ``sum_{v,n} (Q_g^T P_vn Q_a)^2``.

    ``P_vn = sum_s g_vns a_ns^T`` are per-sample weight gradients in sharing
    format. Two contraction orders with different peak memory, selected like
    the reference (``ekfac_hooks.py:208-238``): per-example gradients
    (``N*D1*D2``) vs Gramian (``N*S^2*(D1+D2)``).

    Args:
        g: ``[V, B, S, D1]`` output gradients (KFAC-scaled).
        Q_g: ``[D1, D1]`` eigenvectors of the gradient covariance.
        a: ``[B, S, D2]`` inputs (with bias column when joint), or ``None``
            for a bias-only group.
        Q_a: ``[D2, D2]`` eigenvectors of the input covariance, or ``None``.
        force_strategy: ``'gramian'`` / ``'per_example_gradients'`` / ``None``
            (auto).

    Returns:
        ``[D1, D2]`` correction (``[D1]`` for the bias case).

    Raises:
        ValueError: For an unknown ``force_strategy`` or inconsistent
            ``a``/``Q_a``.
    """
    if force_strategy not in ("gramian", "per_example_gradients", None):
        raise ValueError(f"Invalid force_strategy: {force_strategy}.")
    if (a is None) != (Q_a is None):
        raise ValueError("a and Q_a must both be None or both be arrays.")

    if g.ndim == 5:  # stacked scan group: batch the correction over the stack
        if a is None:
            return jax.vmap(
                lambda gl, Ql: eigenvalue_correction(
                    gl, Ql, None, None, force_strategy
                )
            )(g, Q_g)
        return jax.vmap(
            lambda gl, Qgl, al, Qal: eigenvalue_correction(
                gl, Qgl, al, Qal, force_strategy
            )
        )(g, Q_g, a, Q_a)

    if a is None:  # bias-only: P_vn = sum_s g_vns
        rot = jnp.einsum("jd,vbsj->vbd", Q_g, g)
        return jnp.sum(rot**2, axis=(0, 1))

    S = g.shape[2]
    D1, D2 = Q_g.shape[0], Q_a.shape[0]
    use_gramian = (
        force_strategy == "gramian"
        if force_strategy is not None
        else S**2 * (D1 + D2) < D1 * D2
    )
    if use_gramian:
        a_rot = jnp.einsum("bsj,jd->bsd", a, Q_a)
        g_rot = jnp.einsum("vbsi,id->vbsd", g, Q_g)
        a_gram = jnp.einsum("bsd,btd->bstd", a_rot, a_rot)
        g_gram = jnp.einsum("vbsd,vbtd->vbstd", g_rot, g_rot)
        return jnp.einsum("vbsti,bstj->ij", g_gram, a_gram)
    rotated = jnp.einsum("id,vbsi,bsj,je->vbde", Q_g, g, a, Q_a)
    return jnp.sum(rotated**2, axis=(0, 1))

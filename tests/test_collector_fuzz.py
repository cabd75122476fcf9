"""Randomized collector adversary: generated models must be exact or refuse.

Round 2 found four silent-miscompute holes in the jaxpr collector by hand
review. The reference guards its two KFAC backends against each other
(``curvlinops/kfac.py:89-92`` parametrizes hooks vs make_fx across
``test/test_kfac.py``); the single-backend TPU design replaces that
cross-check with this fuzzer: hundreds of randomly composed models (dense
variants, weight views, conv, embedding, cond, bias patterns, adversarial
mutations) each asserted to EITHER

- construct and match the dense block-diagonal GGN oracle exactly
  (one datum + TYPE2 => KFAC is exact, the reference's acceptance gate), OR
- refuse with ``ValueError``/``NotImplementedError``.

Anything else — a constructed operator whose ``todense()`` deviates from the
oracle — is a silent miscompute and fails the suite with its seed pinned.

A second oracle fuzzes the ``lax.scan`` path: a random scanned layer stack
must produce the operator of its unrolled twin, slice by slice.

A third oracle family covers what one-datum TYPE2 cannot see: deep-LINEAR
nets + MSE are exactly block-diagonal-GGN for KFAC even with batches ``B>1``,
multiple (ragged) batches, and weight sharing — the reference's
``test/kfac_cases.py:76-120`` EXPAND/REDUCE axis.  Fuzzing sequence lengths,
sharing dims, reductions, and batch splits here catches silent SCALING bugs
(normalization, loss correction, sharing-axis concatenation) invisible to
the B=1 oracle.  ``lax.cond`` is excluded by design: different batches can
take different branches, which breaks the Kronecker factorization across
batches legitimately (approximation error, not a miscompute).

A fourth family is the CONV sibling of the third (the reference's Conv2d
weight-sharing exactness axis, ``test/kfac_cases.py:98-112``): a first conv
with fuzzed layout / kernel / stride / padding / dilation / groups followed
by a deep-LINEAR tail of 1x1 stride-1 convs.  Per output location the model
is the same deep-linear map of that location's input patch, so KFAC
EXPAND/REDUCE with TYPE2 + MSE is exactly the block-diagonal GGN — covering
the conv canonicalization the dense families cannot touch: layout
permutations (NHWC/NCHW x HWIO/OIHW, 1-D and 2-D), strided patch
extraction, SAME/VALID/negative padding (the pad fallback), kernel
dilation, grouped-channel averaging (exact when the input channels are
group-replicated, reducing it to the ungrouped case), channel-axis biases
in either layout, and the REDUCE averaged-patch path.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curvlinops_tpu import CrossEntropyLoss, FisherType, KFACType, MSELoss
from curvlinops_tpu.kfac.operator import KFACLinearOperator

from tests.test_kfac import blockdiag_projection
from tests.utils import dense_ggn, report_nonclose

# ---------------------------------------------------------------------------
# case generator
# ---------------------------------------------------------------------------


def _key(rng):
    return jax.random.key(rng.randrange(2**31))


def _normal(rng, shape, scale=0.4):
    return scale * jax.random.normal(_key(rng), shape)


def _gen_first_segment(rng, params):
    """Input-producing segment: plain features, conv-to-1x1, or embedding.

    Returns ``(apply, d_out, make_input)`` where ``make_input(rng)`` builds a
    one-datum input batch for the composed model.
    """
    kind = rng.choice(["features", "features", "conv_full", "embedding"])
    if kind == "features":
        d = rng.choice([2, 3, 4])
        return (lambda p, x: x), d, (lambda rng: _normal(rng, (1, d), 1.0))
    if kind == "conv_full":
        k, c, o = rng.choice([2, 3]), rng.choice([1, 2]), rng.choice([2, 3])
        params["conv"] = {"W": _normal(rng, (k, k, c, o))}

        def apply(p, x):
            z = jax.lax.conv_general_dilated(
                x, p["conv"]["W"], (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )  # full-kernel VALID conv: one output location => no sharing
            return z.reshape(z.shape[0], -1)

        return apply, o, (lambda rng: _normal(rng, (1, k, k, c), 1.0))
    # embedding: a single token (T=1) so no weight sharing within the datum
    v, d = rng.choice([5, 8]), rng.choice([2, 3])
    params["emb"] = {"E": _normal(rng, (v, d))}

    def apply(p, tok):
        return p["emb"]["E"][tok]  # [1, 1] tokens -> [1, 1, d]

    def make_input(rng):
        return jax.random.randint(_key(rng), (1, 1), 0, v)

    # flatten the trailing token axis away
    return (
        lambda p, x: apply(p, x).reshape(x.shape[0], -1),
        d,
        make_input,
    )


def _gen_segment(rng, idx, d_in, params):
    """One feature-transforming segment. Returns ``(apply, d_out)``."""
    kind = rng.choice(
        ["dense", "dense", "dense_T", "dense_flat", "dense_slice",
         "bias_only", "cond"]
    )
    name = f"seg{idx}"
    if kind == "bias_only":
        params[name] = {"b": _normal(rng, (d_in,))}
        return (lambda p, x, n=name: x + p[n]["b"]), d_in

    d_out = rng.choice([2, 3, 4])
    bias = rng.random() < 0.6
    if kind == "dense":
        params[name] = {"W": _normal(rng, (d_in, d_out))}
        if bias:
            params[name]["b"] = _normal(rng, (d_out,), 0.1)

        def apply(p, x, n=name, bias=bias):
            h = x @ p[n]["W"]
            return h + p[n]["b"] if bias else h

        return apply, d_out
    if kind == "dense_T":
        params[name] = {"W": _normal(rng, (d_out, d_in))}
        return (lambda p, x, n=name: x @ p[n]["W"].T), d_out
    if kind == "dense_flat":
        params[name] = {"w": _normal(rng, (d_in * d_out,))}
        return (
            lambda p, x, n=name, s=(d_in, d_out): x @ p[n]["w"].reshape(s)
        ), d_out
    if kind == "dense_slice":
        params[name] = {"W": _normal(rng, (d_in + 2, d_out))}
        return (lambda p, x, n=name, d=d_in: x @ p[n]["W"][1 : 1 + d]), d_out
    # cond: data-derived predicate picks one of two dense branches
    params[name] = {
        "Wa": _normal(rng, (d_in, d_out)),
        "Wb": _normal(rng, (d_in, d_out)),
    }

    def apply(p, x, n=name):
        return jax.lax.cond(
            jnp.sum(x) > 0.0,
            lambda x: x @ p[n]["Wa"],
            lambda x: x @ p[n]["Wb"],
            x,
        )

    return apply, d_out


_ACTS = [jnp.tanh, jax.nn.relu, jax.nn.sigmoid, None]


def _gen_mutation(rng, d_out, params, first_bias_name):
    """Adversarial tail mutation; must refuse or stay exact."""
    kind = rng.choice(
        ["reversed_bias", "elementwise", "tied_bias", "while_dense"]
    )
    if kind == "reversed_bias":
        params["mut"] = {"b": _normal(rng, (d_out,), 0.1)}
        return lambda p, x: x + p["mut"]["b"][::-1]
    if kind == "elementwise":
        params["mut"] = {"g": 1.0 + _normal(rng, (d_out,), 0.1)}
        return lambda p, x: x * p["mut"]["g"]
    if kind == "tied_bias" and first_bias_name is not None:
        n = first_bias_name  # reuse an earlier layer's bias on the output

        def apply(p, x):
            b = p[n]["b"]
            return x + b if b.shape[0] == x.shape[-1] else x + b.sum()

        return apply
    if kind == "while_dense":
        params["mut"] = {"W": _normal(rng, (d_out, d_out))}

        def apply(p, x):
            out, _ = jax.lax.while_loop(
                lambda c: c[1] < 1,
                lambda c: (c[0] @ p["mut"]["W"], c[1] + 1),
                (x, 0),
            )
            return out

        return apply
    return None


def build_case(seed):
    """Compose a random one-datum model + loss; deterministic per seed."""
    rng = random.Random(seed)
    params = {}
    first, d, make_input = _gen_first_segment(rng, params)
    segments = [first]
    first_bias_name = None
    for idx in range(rng.choice([1, 2, 3])):
        act = rng.choice(_ACTS)
        if act is not None:
            segments.append(lambda p, x, a=act: a(x))
        seg, d = _gen_segment(rng, idx, d, params)
        segments.append(seg)
        name = f"seg{idx}"
        if first_bias_name is None and "b" in params.get(name, {}):
            first_bias_name = name
    if rng.random() < 0.3:
        mut = _gen_mutation(rng, d, params, first_bias_name)
        if mut is not None:
            segments.append(mut)

    def model_fn(p, x):
        for seg in segments:
            x = seg(p, x)
        return x

    X = make_input(rng)
    if rng.random() < 0.5 and d >= 2:
        loss = CrossEntropyLoss(rng.choice(["mean", "sum"]))
        y = jax.random.randint(_key(rng), (1,), 0, d)
    else:
        loss = MSELoss(rng.choice(["mean", "sum"]))
        y = _normal(rng, (1, d), 1.0)
    return dict(
        model_fn=model_fn,
        loss_fn=loss,
        params=params,
        data=[(X, y)],
        separate=rng.random() < 0.7,
    )


# ---------------------------------------------------------------------------
# oracle 1: one-datum TYPE2 exactness or refusal
# ---------------------------------------------------------------------------

_CHUNK = 20
_N_CHUNKS = 10  # 200 generated cases


@pytest.mark.parametrize("chunk", range(_N_CHUNKS))
def test_fuzz_exact_or_refuse(chunk):
    built, refused = 0, 0
    for seed in range(chunk * _CHUNK, (chunk + 1) * _CHUNK):
        case = build_case(seed)
        try:
            kfac = KFACLinearOperator(
                case["model_fn"],
                case["loss_fn"],
                case["params"],
                case["data"],
                fisher_type=FisherType.TYPE2,
                separate_weight_and_bias=case["separate"],
                check_deterministic=False,
            )
            dense_kfac = np.asarray(kfac.todense())
        except (ValueError, NotImplementedError):
            refused += 1
            continue
        built += 1
        dense = dense_ggn(
            case["model_fn"], case["loss_fn"], case["params"], case["data"]
        )
        expected = blockdiag_projection(
            np.asarray(dense), case["params"], kfac.groups
        )
        report_nonclose(
            dense_kfac, expected, rtol=5e-3, atol=1e-5, name=f"seed {seed}"
        )
    # the suite must not be vacuous — a healthy majority of cases construct
    assert built >= _CHUNK // 3, (built, refused)


# ---------------------------------------------------------------------------
# oracle 2: scanned layer stack == unrolled twin
# ---------------------------------------------------------------------------


def build_scan_pair(seed):
    """A random scanned stack and its unrolled twin over identical weights."""
    rng = random.Random(seed)
    L = rng.choice([2, 3])
    d = rng.choice([2, 3])
    N = rng.choice([2, 4])
    act = rng.choice([jnp.tanh, jax.nn.relu, None])
    bias = rng.random() < 0.6
    head = rng.random() < 0.5

    Ws = _normal(rng, (L, d, d))
    bs = _normal(rng, (L, d), 0.1) if bias else None
    Wh = _normal(rng, (d, d)) if head else None

    def post(h, p):
        return h @ p["head"]["W"] if head else h

    def scan_fn(p, x):
        def body(h, wb):
            h = h @ wb[0]
            if bias:
                h = h + wb[1]
            return (act(h) if act is not None else h), None

        xs = (p["stack"]["W"], p["stack"]["b"]) if bias else (p["stack"]["W"],)
        h, _ = jax.lax.scan(body, x, xs)
        return post(h, p)

    def unrolled_fn(p, x):
        h = x
        for l in range(L):
            h = h @ p[f"layer{l}"]["W"]
            if bias:
                h = h + p[f"layer{l}"]["b"]
            if act is not None:
                h = act(h)
        return post(h, p)

    params_scan = {"stack": {"W": Ws} | ({"b": bs} if bias else {})}
    params_unroll = {
        f"layer{l}": {"W": Ws[l]} | ({"b": bs[l]} if bias else {})
        for l in range(L)
    }
    if head:
        params_scan["head"] = {"W": Wh}
        params_unroll["head"] = {"W": Wh}

    X = _normal(rng, (N, d), 1.0)
    y = _normal(rng, (N, d), 1.0)
    data = [(X, y)]
    loss = MSELoss(rng.choice(["mean", "sum"]))
    sep = rng.random() < 0.7

    def to_unrolled(v_scan):
        out = {
            f"layer{l}": jax.tree.map(lambda a: a[l], v_scan["stack"])
            for l in range(L)
        }
        if head:
            out["head"] = v_scan["head"]
        return out

    return dict(
        scan_fn=scan_fn, unrolled_fn=unrolled_fn, params_scan=params_scan,
        params_unroll=params_unroll, data=data, loss=loss, separate=sep,
        to_unrolled=to_unrolled, L=L,
    )


@pytest.mark.parametrize("chunk", range(4))
def test_fuzz_scan_equals_unrolled(chunk, n_per_chunk=10):
    for seed in range(chunk * n_per_chunk, (chunk + 1) * n_per_chunk):
        c = build_scan_pair(seed)
        kw = dict(
            fisher_type=FisherType.TYPE2,
            separate_weight_and_bias=c["separate"],
            check_deterministic=False,
        )
        k_s = KFACLinearOperator(
            c["scan_fn"], c["loss"], c["params_scan"], c["data"], **kw
        )
        k_u = KFACLinearOperator(
            c["unrolled_fn"], c["loss"], c["params_unroll"], c["data"], **kw
        )
        v_s = jax.tree.map(
            lambda a: jax.random.normal(jax.random.key(seed), a.shape),
            c["params_scan"],
        )
        r_s = k_s @ v_s
        r_u = k_u @ c["to_unrolled"](v_s)
        r_s_mapped = c["to_unrolled"](r_s)
        for l in range(c["L"]):
            for leaf in r_u[f"layer{l}"]:
                report_nonclose(
                    r_s_mapped[f"layer{l}"][leaf],
                    r_u[f"layer{l}"][leaf],
                    rtol=5e-4,
                    atol=5e-5,
                    name=f"seed {seed} layer{l}/{leaf}",
                )
        if "head" in r_u:
            report_nonclose(
                r_s_mapped["head"]["W"], r_u["head"]["W"],
                rtol=5e-4, atol=5e-5, name=f"seed {seed} head",
            )


# ---------------------------------------------------------------------------
# oracle 3: deep-linear + MSE sharing/scaling exactness (S>1, multi-batch)
# ---------------------------------------------------------------------------


def _gen_linear_segment(rng, idx, d_in, params, prev_biased=False):
    """One LINEAR feature segment (dense variants / views / bias-only).

    Returns ``(apply, d_out, ends_biased)``.  A bias-only segment directly
    after a biased one is skipped from the draw: two consecutive adds merge
    into one layer with conflicting biases — a correct refusal, but drawing
    it often makes chunks vacuous.  (``dense_slice`` stays in the pool even
    though it always refuses — slice views are not invertible — because the
    refusal-path coverage is part of the oracle.)
    """
    kinds = ["dense", "dense", "dense_T", "dense_flat", "dense_slice"]
    if not prev_biased:
        kinds.append("bias_only")
    kind = rng.choice(kinds)
    name = f"seg{idx}"
    if kind == "bias_only":
        params[name] = {"b": _normal(rng, (d_in,))}
        return (lambda p, x, n=name: x + p[n]["b"]), d_in, True
    d_out = rng.choice([2, 3, 4])
    bias = rng.random() < 0.6
    if kind == "dense":
        params[name] = {"W": _normal(rng, (d_in, d_out))}
    elif kind == "dense_T":
        params[name] = {"W": _normal(rng, (d_out, d_in))}
    elif kind == "dense_flat":
        params[name] = {"w": _normal(rng, (d_in * d_out,))}
    else:  # dense_slice
        params[name] = {"W": _normal(rng, (d_in + 2, d_out))}
    if bias:
        params[name]["b"] = _normal(rng, (d_out,), 0.1)

    def apply(p, x, n=name, k=kind, d=d_in, o=d_out, bias=bias):
        if k == "dense":
            h = x @ p[n]["W"]
        elif k == "dense_T":
            h = x @ p[n]["W"].T
        elif k == "dense_flat":
            h = x @ p[n]["w"].reshape(d, o)
        else:
            h = x @ p[n]["W"][1 : 1 + d]
        return h + p[n]["b"] if bias else h

    return apply, d_out, bias


def build_linear_sharing_case(seed):
    """Random deep-linear net + MSE with sharing/batch-split fuzzing.

    KFAC TYPE2 on linear nets with MSE is exactly the block-diagonal GGN in
    all three settings (none / EXPAND / REDUCE-mean-pool) — any deviation is
    a scaling or sharing-axis miscompute.
    """
    rng = random.Random(seed)
    params = {}
    first_d = d = rng.choice([2, 3, 4])
    segments = []
    biased = False
    for idx in range(rng.choice([1, 2, 3])):
        seg, d, biased = _gen_linear_segment(rng, idx, d, params, biased)
        segments.append(seg)

    setting = rng.choice(["none", "expand", "expand", "reduce", "reduce"])
    share_dims = (
        ()
        if setting == "none"
        else tuple(
            rng.choice([2, 3, 5]) for _ in range(rng.choice([1, 1, 1, 2]))
        )
    )
    head = setting == "reduce" and rng.random() < 0.5
    if head:
        params["head"] = {"W": _normal(rng, (d, rng.choice([2, 3])))}

    def model_fn(p, x):
        for seg in segments:
            x = seg(p, x)
        if setting == "reduce":
            x = x.mean(axis=tuple(range(1, 1 + len(share_dims))))
            if head:
                x = x @ p["head"]["W"]
        return x

    d_out = d if not head else params["head"]["W"].shape[1]
    batches = rng.choice([1, 2, 3])
    sizes = [rng.choice([1, 2, 4]) for _ in range(batches)]
    data = []
    for B in sizes:
        X = _normal(rng, (B, *share_dims, first_d), 1.0)
        y_shape = (
            (B, *share_dims, d_out) if setting == "expand" else (B, d_out)
        )
        y = _normal(rng, y_shape, 1.0)
        data.append((X, y))
    approx = KFACType.REDUCE if setting == "reduce" else KFACType.EXPAND
    return dict(
        model_fn=model_fn,
        loss_fn=MSELoss(rng.choice(["mean", "sum"])),
        params=params,
        data=data,
        separate=rng.random() < 0.7,
        kfac_approx=approx,
        setting=setting,
    )


@pytest.mark.parametrize("chunk", range(6))
def test_fuzz_linear_sharing_exact_or_refuse(chunk, n_per_chunk=20):
    """120 generated deep-linear sharing cases: exact or refuse."""
    built, refused = 0, 0
    for seed in range(chunk * n_per_chunk, (chunk + 1) * n_per_chunk):
        case = build_linear_sharing_case(seed)
        try:
            kfac = KFACLinearOperator(
                case["model_fn"],
                case["loss_fn"],
                case["params"],
                case["data"],
                fisher_type=FisherType.TYPE2,
                kfac_approx=case["kfac_approx"],
                separate_weight_and_bias=case["separate"],
                check_deterministic=False,
            )
            dense_kfac = np.asarray(kfac.todense())
        except (ValueError, NotImplementedError):
            refused += 1
            continue
        built += 1
        dense = dense_ggn(
            case["model_fn"], case["loss_fn"], case["params"], case["data"]
        )
        expected = blockdiag_projection(
            np.asarray(dense), case["params"], kfac.groups
        )
        report_nonclose(
            dense_kfac,
            expected,
            rtol=5e-3,
            atol=1e-5,
            name=f"seed {seed} ({case['setting']})",
        )
    assert built >= n_per_chunk // 3, (built, refused)


# ---------------------------------------------------------------------------
# oracle 4: conv weight-sharing exactness (layouts x groups x strides)
# ---------------------------------------------------------------------------

_RHS_2D = ["HWIO", "OIHW"]
_LHS_2D = ["NHWC", "NCHW"]
_RHS_1D = ["WIO", "OIW"]
_LHS_1D = ["NWC", "NCW"]


def _weight_shape(rhs_spec, c_in_pg, c_out, ksizes):
    """Build the kernel shape from an rhs dimension-numbers string."""
    spatial = iter(ksizes)
    return tuple(
        c_out if ch == "O" else c_in_pg if ch == "I" else next(spatial)
        for ch in rhs_spec
    )


def _channel_axis(layout):
    return layout.index("C")


def _spatial_axes(layout):
    return tuple(i for i, ch in enumerate(layout) if ch not in "NC")


def _gen_conv_layer(rng, idx, layout, c_in, spatial, params, *, first,
                    groups=1):
    """One conv segment; returns ``(apply, out_layout, c_out, out_spatial)``.

    The first layer draws adversarial kernel/stride/padding/dilation (and
    takes the builder's ``groups``); later layers are 1x1 stride-1 VALID
    (the per-location deep-linear tail that keeps EXPAND/REDUCE provably
    exact).
    """
    nd = len(spatial)
    rhs = rng.choice(_RHS_2D if nd == 2 else _RHS_1D)
    out_layout = rng.choice(_LHS_2D if nd == 2 else _LHS_1D)
    name = f"conv{idx}"
    if first:
        ksizes = tuple(rng.randint(1, min(3, s)) for s in spatial)
        strides = tuple(rng.choice([1, 1, 2]) for _ in spatial)
        pad_kind = rng.choice(["VALID", "VALID", "SAME", "negative"])
        if pad_kind == "negative" and all(
            s - k >= 1 for s, k in zip(spatial, ksizes)
        ):
            padding = [(-1, 0)] + [(0, 0)] * (nd - 1)
        elif pad_kind == "SAME":
            padding = "SAME"
        else:
            padding = "VALID"
        rhs_dilation = tuple(
            rng.choice([1, 1, 1, 2]) if (k - 1) * 2 + 1 <= s else 1
            for k, s in zip(ksizes, spatial)
        )
    else:
        ksizes = (1,) * nd
        strides = (1,) * nd
        padding = "VALID"
        rhs_dilation = (1,) * nd
    c_out = rng.choice([2, 3]) if groups == 1 else rng.choice([2, 4])
    c_in_pg = c_in // groups
    params[name] = {"W": _normal(rng, _weight_shape(rhs, c_in_pg, c_out, ksizes))}
    bias = rng.random() < 0.5
    if bias:
        params[name]["b"] = _normal(rng, (c_out,), 0.1)
    dimnums = (layout, rhs, out_layout)
    c_ax = _channel_axis(out_layout)

    def apply(p, x, n=name):
        z = jax.lax.conv_general_dilated(
            x, p[n]["W"], strides, padding,
            rhs_dilation=rhs_dilation,
            dimension_numbers=dimnums,
            feature_group_count=groups,
        )
        if bias:
            bshape = [1] * z.ndim
            bshape[c_ax] = c_out
            z = z + p[n]["b"].reshape(bshape)
        return z

    # infer the output spatial sizes by tracing the layer shape once
    probe = jax.eval_shape(
        apply,
        {name: {k: jax.ShapeDtypeStruct(v.shape, v.dtype)
                for k, v in params[name].items()}},
        jax.ShapeDtypeStruct(
            tuple(
                1 if ch == "N" else c_in if ch == "C"
                else spatial[_spatial_axes(layout).index(i)]
                for i, ch in enumerate(layout)
            ),
            jnp.float32,
        ),
    )
    out_spatial = tuple(probe.shape[a] for a in _spatial_axes(out_layout))
    return apply, out_layout, c_out, out_spatial, groups


def build_conv_sharing_case(seed):
    """Random conv-front deep-linear net + MSE; exact for EXPAND and REDUCE."""
    rng = random.Random(seed)
    params = {}
    nd = rng.choice([1, 2])
    spatial = (
        tuple(rng.choice([3, 4, 5]) for _ in range(2))
        if nd == 2
        else (rng.choice([4, 6, 8]),)
    )
    layout = rng.choice(_LHS_2D if nd == 2 else _LHS_1D)
    in_layout = layout
    c_in = rng.choice([1, 2, 3])

    segments = []
    cur_spatial = spatial
    first_groups = 2 if rng.random() < 0.3 else 1
    if first_groups > 1:
        # grouped first conv needs an even channel count to replicate
        c_in = rng.choice([2, 4])
    c = c_in
    n_layers = rng.choice([1, 1, 2, 3])
    for idx in range(n_layers):
        seg, layout, c, cur_spatial, g = _gen_conv_layer(
            rng, idx, layout, c, cur_spatial, params, first=(idx == 0),
            groups=first_groups if idx == 0 else 1,
        )
        segments.append(seg)
        if any(s < 1 for s in cur_spatial):  # over-cropped draw: retry seed
            return None

    setting = rng.choice(["expand", "expand", "reduce", "reduce"])
    flatten = setting == "expand" and rng.random() < 0.3
    head = setting == "reduce" and rng.random() < 0.5
    if head:
        params["head"] = {"W": _normal(rng, (c, rng.choice([2, 3])))}

    final_layout = layout
    sp_axes = _spatial_axes(final_layout)
    c_ax = _channel_axis(final_layout)
    to_channels_last = (0, *sp_axes, c_ax)

    def model_fn(p, x):
        for seg in segments:
            x = seg(p, x)
        if setting == "reduce":
            x = x.mean(axis=sp_axes)
            if head:
                x = x @ p["head"]["W"]
            return x
        x = x.transpose(to_channels_last)
        return x.reshape(x.shape[0], -1) if flatten else x

    d_out = c if not head else params["head"]["W"].shape[1]
    in_sp_axes = _spatial_axes(in_layout)
    in_c_ax = _channel_axis(in_layout)

    def make_X(rng, B):
        shape = [B] * len(in_layout)
        for a, s in zip(in_sp_axes, spatial):
            shape[a] = s
        if first_groups > 1:
            # group-replicated input channels: grouped-channel averaging
            # reduces exactly to the ungrouped single-group case
            shape[in_c_ax] = c_in // first_groups
            base = _normal(rng, tuple(shape), 1.0)
            return jnp.concatenate([base] * first_groups, axis=in_c_ax)
        shape[in_c_ax] = c_in
        return _normal(rng, tuple(shape), 1.0)

    out_spatial = cur_spatial
    batches = rng.choice([1, 2])
    data = []
    for _ in range(batches):
        B = rng.choice([1, 2, 4])
        X = make_X(rng, B)
        if setting == "reduce":
            y = _normal(rng, (B, d_out), 1.0)
        elif flatten:
            y = _normal(rng, (B, int(np.prod(out_spatial)) * c), 1.0)
        else:
            y = _normal(rng, (B, *out_spatial, c), 1.0)
        data.append((X, y))

    approx = KFACType.REDUCE if setting == "reduce" else KFACType.EXPAND
    return dict(
        model_fn=model_fn,
        loss_fn=MSELoss(rng.choice(["mean", "sum"])),
        params=params,
        data=data,
        separate=rng.random() < 0.7,
        kfac_approx=approx,
        setting=f"{setting} nd={nd} groups={first_groups}",
    )


@pytest.mark.parametrize("chunk", range(6))
def test_fuzz_conv_sharing_exact_or_refuse(chunk, n_per_chunk=15):
    """90 generated conv-sharing cases: exact vs dense GGN or refuse."""
    built, refused = 0, 0
    for seed in range(chunk * n_per_chunk, (chunk + 1) * n_per_chunk):
        case = build_conv_sharing_case(seed)
        if case is None:  # degenerate spatial draw
            continue
        try:
            kfac = KFACLinearOperator(
                case["model_fn"],
                case["loss_fn"],
                case["params"],
                case["data"],
                fisher_type=FisherType.TYPE2,
                kfac_approx=case["kfac_approx"],
                separate_weight_and_bias=case["separate"],
                check_deterministic=False,
            )
            dense_kfac = np.asarray(kfac.todense())
        except (ValueError, NotImplementedError):
            refused += 1
            continue
        built += 1
        dense = dense_ggn(
            case["model_fn"], case["loss_fn"], case["params"], case["data"]
        )
        expected = blockdiag_projection(
            np.asarray(dense), case["params"], kfac.groups
        )
        report_nonclose(
            dense_kfac,
            expected,
            rtol=5e-3,
            atol=2e-5,
            name=f"seed {seed} ({case['setting']})",
        )
    assert built >= n_per_chunk // 3, (built, refused)

"""Data-parallel execution on the virtual 8-device CPU mesh.

The analogue of distributed tests the reference doesn't have (SURVEY.md §4):
sharded results must match single-device results exactly (modulo float
reduction order).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curvlinops_tpu import GGNLinearOperator, HessianLinearOperator
from curvlinops_tpu.kfac.operator import KFACLinearOperator
from curvlinops_tpu.parallel.mesh import make_mesh, shard_params

from tests.cases import make_case
from tests.utils import report_nonclose


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_make_mesh_rejects_positional_axis_names():
    # make_mesh(('data',)) used to crash with an opaque slice TypeError
    with pytest.raises(TypeError, match="axis_names"):
        make_mesh(("data",))


def test_make_mesh_accepts_numpy_int():
    # n computed from numpy shapes/sizes must keep working (operator.index)
    import numpy as np

    mesh = make_mesh(np.int64(4))
    assert mesh.devices.size == 4


def test_ggn_matvec_matches_across_mesh(mesh):
    case = make_case("mlp_ce_mean", seed=1)
    # batch must be divisible by the mesh; cases use N=12, batches of 4 -> pad
    X = jnp.concatenate([case["data"][0][0]] * 2)[:8]
    y = jnp.concatenate([case["data"][0][1]] * 2)[:8]
    data = [(X, y)]

    single = GGNLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], data,
        check_deterministic=False,
    )
    sharded = GGNLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], data,
        mesh=mesh, check_deterministic=False,
    )
    v = np.random.default_rng(0).standard_normal(single.shape[0]).astype(np.float32)
    report_nonclose(sharded @ v, single @ v, rtol=1e-5, atol=1e-6,
                    name="dp ggn matvec")


def test_hessian_gradient_and_loss_across_mesh(mesh):
    case = make_case("mlp_mse_mean", seed=2)
    X = jnp.concatenate([case["data"][0][0]] * 2)
    y = jnp.concatenate([case["data"][0][1]] * 2)
    data = [(X, y)]
    single = HessianLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], data,
        check_deterministic=False,
    )
    sharded = HessianLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], data,
        mesh=mesh, check_deterministic=False,
    )
    g1, l1 = single.gradient_and_loss()
    g2, l2 = sharded.gradient_and_loss()
    report_nonclose(l1, l2, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        report_nonclose(a, b, rtol=1e-5, atol=1e-7)


def test_kfac_factors_across_mesh(mesh):
    case = make_case("mlp_ce_mean", seed=3)
    X = jnp.concatenate([case["data"][0][0]] * 2)[:8]
    y = jnp.concatenate([case["data"][0][1]] * 2)[:8]
    data = [(X, y)]
    kw = dict(fisher_type="type-2", check_deterministic=False)
    single = KFACLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], data, **kw
    )
    sharded = KFACLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], data, mesh=mesh, **kw
    )
    for gi in single._ggT:
        report_nonclose(
            sharded._ggT[gi], single._ggT[gi], rtol=1e-5, atol=1e-6,
            name=f"ggT {gi}",
        )
    for gi in single._aaT:
        report_nonclose(
            sharded._aaT[gi], single._aaT[gi], rtol=1e-5, atol=1e-6,
            name=f"aaT {gi}",
        )


def test_2d_mesh_with_sharded_params():
    """dp x mp mesh: params sharded over 'model', batch over 'data'."""
    mesh2d = make_mesh(8, axis_names=("data", "model"), shape=(4, 2))
    case = make_case("mlp_ce_mean", seed=4)
    X = jnp.concatenate([case["data"][0][0]] * 2)[:8]
    y = jnp.concatenate([case["data"][0][1]] * 2)[:8]
    data = [(X, y)]

    single = GGNLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], data,
        check_deterministic=False,
    )
    params_sharded = shard_params(case["params"], mesh2d, min_size=2)
    op = GGNLinearOperator(
        case["model_fn"], case["loss_fn"], params_sharded, data,
        mesh=mesh2d, check_deterministic=False,
    )
    v = np.random.default_rng(1).standard_normal(op.shape[0]).astype(np.float32)
    report_nonclose(op @ v, single @ v, rtol=1e-5, atol=1e-6, name="dp+mp matvec")


def test_ekfac_across_mesh(mesh):
    from curvlinops_tpu.kfac.ekfac import EKFACLinearOperator

    case = make_case("mlp_ce_mean", seed=5)
    X = jnp.concatenate([case["data"][0][0]] * 2)[:8]
    y = jnp.concatenate([case["data"][0][1]] * 2)[:8]
    data = [(X, y)]
    kw = dict(fisher_type="type-2", check_deterministic=False)
    single = EKFACLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], data, **kw
    )
    sharded = EKFACLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], data, mesh=mesh, **kw
    )
    for gi in single.corrected_eigenvalues:
        report_nonclose(
            sharded.corrected_eigenvalues[gi],
            single.corrected_eigenvalues[gi],
            rtol=1e-4,
            atol=1e-6,
            name=f"lambdas {gi}",
        )


def test_ggn_diagonal_across_mesh(mesh):
    from curvlinops_tpu import GGNDiagonalLinearOperator

    case = make_case("mlp_ce_mean", seed=6)
    X = jnp.concatenate([case["data"][0][0]] * 2)[:8]
    y = jnp.concatenate([case["data"][0][1]] * 2)[:8]
    data = [(X, y)]
    single = GGNDiagonalLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], data,
        check_deterministic=False,
    )
    sharded = GGNDiagonalLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], data, mesh=mesh,
        check_deterministic=False,
    )
    for a, b in zip(jax.tree.leaves(single.diagonal), jax.tree.leaves(sharded.diagonal)):
        report_nonclose(b, a, rtol=1e-5, atol=1e-7)


def test_mesh_distributed_eigh(mesh):
    """batched_eigh with a mesh shards the stacks; results match unsharded."""
    from curvlinops_tpu.kfac.chain import batched_eigh

    key = jax.random.key(0)
    mats = {}
    for i, (n, d) in enumerate([(None, 6), (None, 6), (3, 4), (5, 4)]):
        shape = (d, d) if n is None else (n, d, d)
        A = jax.random.normal(jax.random.fold_in(key, i), shape)
        mats[i] = A @ jnp.swapaxes(A, -1, -2) + 0.1 * jnp.eye(d)

    plain = batched_eigh(mats)
    sharded = batched_eigh(mats, mesh=mesh)
    for k in mats:
        report_nonclose(plain[k][0], sharded[k][0], 1e-5, 1e-6, name=f"w{k}")
        # eigenvectors are sign-ambiguous; compare reconstructions
        w_p, v_p = plain[k]
        w_s, v_s = sharded[k]
        rec_p = jnp.einsum("...ij,...j,...kj->...ik", v_p, w_p, v_p)
        rec_s = jnp.einsum("...ij,...j,...kj->...ik", v_s, w_s, v_s)
        report_nonclose(rec_p, rec_s, 1e-5, 1e-6, name=f"rec{k}")


def test_kfac_exact_damped_inverse_across_mesh(mesh):
    """Mesh-built KFAC's exact-damped inverse (sharded eigh) matches local."""
    case = make_case("mlp_mse_mean")
    X = jnp.concatenate([case["data"][0][0]] * 2)[:8]
    y = jnp.concatenate([case["data"][0][1]] * 2)[:8]
    data = [(X, y)]
    kwargs = dict(fisher_type="type-2", check_deterministic=False)
    k0 = KFACLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], data, **kwargs
    )
    k8 = KFACLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], data,
        mesh=mesh, **kwargs
    )
    v = np.random.default_rng(0).standard_normal(k0.shape[0]).astype(np.float32)
    r0 = k0.inverse(damping=0.1, use_exact_damping=True) @ v
    r8 = k8.inverse(damping=0.1, use_exact_damping=True) @ v
    report_nonclose(r0, r8, 1e-4, 1e-6, name="exact-damped inverse")


def test_kfoc_across_mesh(mesh):
    from curvlinops_tpu.kfac.kfoc import KFOCLinearOperator

    case = make_case("mlp_ce_mean", seed=7)
    X = jnp.concatenate([case["data"][0][0]] * 2)[:8]
    y = jnp.concatenate([case["data"][0][1]] * 2)[:8]
    data = [(X, y)]
    kw = dict(fisher_type="type-2", check_deterministic=False)
    single = KFOCLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], data, **kw
    )
    sharded = KFOCLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], data, mesh=mesh, **kw
    )
    v = np.random.default_rng(3).standard_normal(single.shape[0]).astype(np.float32)
    report_nonclose(sharded @ v, single @ v, rtol=1e-4, atol=1e-6,
                    name="kfoc mesh matvec")


def test_minres_solve_across_mesh(mesh):
    """MINRES through traced() on a mesh-sharded Hessian equals the
    single-device solve."""
    from curvlinops_tpu import IdentityLinearOperator, MINRESInverseLinearOperator

    case = make_case("mlp_mse_mean", seed=3)
    X = jnp.concatenate([case["data"][0][0]] * 2)[:8]
    y = jnp.concatenate([case["data"][0][1]] * 2)[:8]
    data = [(X, y)]
    kw = dict(check_deterministic=False)
    H1 = HessianLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], data, **kw
    )
    H2 = HessianLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], data, mesh=mesh, **kw
    )
    shift = 0.5 * IdentityLinearOperator(H1.in_spec)
    v = np.random.default_rng(0).normal(size=H1.shape[0]).astype(np.float32)
    x1 = MINRESInverseLinearOperator(H1 + shift, maxiter=400, tol=1e-9) @ v
    x2 = MINRESInverseLinearOperator(H2 + shift, maxiter=400, tol=1e-9) @ v
    report_nonclose(x1, x2, rtol=1e-4, atol=1e-5, name="mesh MINRES")


def test_held_linearization_across_mesh(mesh):
    """op.linearized() on a mesh-sharded GGN equals the single-device held
    operator."""
    case = make_case("mlp_ce_mean", seed=4)
    X = jnp.concatenate([case["data"][0][0]] * 2)[:8]
    y = jnp.concatenate([case["data"][0][1]] * 2)[:8]
    data = [(X, y)]
    kw = dict(check_deterministic=False)
    G1 = GGNLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], data, **kw
    ).linearized()
    G2 = GGNLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], data, mesh=mesh, **kw
    ).linearized()
    v = np.random.default_rng(1).normal(size=G1.shape[0]).astype(np.float32)
    report_nonclose(G1 @ v, G2 @ v, rtol=1e-5, atol=1e-6, name="mesh held")


def test_kfac_rank_inverse_across_mesh(mesh):
    """inverse(rank=) with a mesh (sharded range finder + sharded core eigh)
    matches the single-device randomized build: identical omega (zero-padded
    slots are dropped in-program), so the results differ only by reduction
    order."""
    case = make_case("mlp_mse_mean")
    X = jnp.concatenate([case["data"][0][0]] * 2)[:8]
    y = jnp.concatenate([case["data"][0][1]] * 2)[:8]
    data = [(X, y)]
    kwargs = dict(fisher_type="type-2", check_deterministic=False)
    k0 = KFACLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], data, **kwargs
    )
    k8 = KFACLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], data,
        mesh=mesh, **kwargs
    )
    v = np.random.default_rng(0).standard_normal(k0.shape[0]).astype(np.float32)
    key = jax.random.key(3)
    r0 = k0.inverse(damping=0.1, use_exact_damping=True, rank=6, rank_key=key) @ v
    r8 = k8.inverse(damping=0.1, use_exact_damping=True, rank=6, rank_key=key) @ v
    report_nonclose(r0, r8, 1e-3, 1e-5, name="rank-r inverse")


def test_batched_randomized_eigh_across_mesh(mesh):
    """Sharded rank-r decomposition reconstructs like the local one."""
    from curvlinops_tpu.kfac.randomized import batched_randomized_eigh

    mats = {}
    for i, d in enumerate([24, 24, 10]):
        B = jax.random.normal(jax.random.key(i), (d, d)) / jnp.sqrt(d)
        lam = (1.0 + jnp.arange(d, dtype=jnp.float32)) ** (-2.0)
        mats[f"m{i}"] = jnp.einsum("de,e,fe->df", B, lam, B)
    key = jax.random.key(9)
    out0 = batched_randomized_eigh(mats, 8, key)
    out8 = batched_randomized_eigh(mats, 8, key, mesh=mesh)
    for k in mats:
        for a, b, nm in zip(out0[k], out8[k], ("lam", "U", "tail")):
            report_nonclose(a, b, 1e-3, 1e-5, name=f"{k} {nm}")

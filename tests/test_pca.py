"""PCA proposal reduction (reference: ``Parameters/PCAHandler.cpp``)."""
import numpy as np
import pytest

from mach3_tpu.params.pca import construct_pca, from_pca_basis, to_pca_basis


def _cov_with_degenerate_direction():
    # Strongly correlated 3-param block: one tiny eigenvalue
    base = np.array(
        [
            [1.0, 0.99, 0.0],
            [0.99, 1.0, 0.0],
            [0.0, 0.0, 0.5],
        ]
    )
    return base


def test_pca_drops_small_eigenvalues():
    cov = _cov_with_degenerate_direction()
    res = construct_pca(cov, threshold=0.05)
    assert res.n_kept == 2
    assert res.n_dropped == 1
    # The throw matrix reproduces the covariance up to the dropped component
    approx = res.throw_matrix @ res.throw_matrix.T
    eigval = np.linalg.eigvalsh(cov - approx)
    assert np.abs(eigval).max() < 0.02  # only the tiny eigenvalue missing


def test_pca_block_with_identity_outside():
    # 4 params; decompose only the middle block [1, 2]
    cov = np.eye(4)
    cov[1, 1], cov[2, 2] = 2.0, 3.0
    cov[1, 2] = cov[2, 1] = 1.5
    cov[0, 0], cov[3, 3] = 0.25, 4.0
    res = construct_pca(cov, threshold=1e-12, first=1, last=2)
    approx = res.throw_matrix @ res.throw_matrix.T
    assert np.allclose(approx, cov, atol=1e-10)
    # outside-block columns touch only their own parameter
    assert res.throw_matrix[0, res.n_kept:].sum() == pytest.approx(0.5)


def test_transfer_round_trip():
    cov = _cov_with_degenerate_direction()
    res = construct_pca(cov, threshold=1e-6)  # keep all
    v = np.array([0.3, -0.2, 0.7])
    back = from_pca_basis(res, to_pca_basis(res, v))
    assert np.allclose(back, v, atol=1e-10)


def test_proposal_with_rectangular_throw():
    """propose_step works with a [P, K] rectangular factor."""
    import jax
    import jax.numpy as jnp

    from mach3_tpu.params import ParameterSet, PriorModel, propose_step

    cfg = {
        "Systematics": [
            {
                "Systematic": {
                    "Names": {"FancyName": f"p{i}"},
                    "ParameterValues": {"PreFitValue": 0.0},
                    "StepScale": {"MCMC": 1.0},
                    "Error": 1.0,
                    "ParameterBounds": [-10, 10],
                    "Type": "Norm",
                    **(
                        {"Correlations": [{"p1": 0.99}]}
                        if i == 0
                        else {"Correlations": [{"p0": 0.99}]}
                        if i == 1
                        else {}
                    ),
                }
            }
            for i in range(3)
        ]
    }
    ps = ParameterSet.from_config(cfg)
    res = construct_pca(ps.covariance, threshold=0.05)
    model = PriorModel.from_parameter_set(ps)
    model = model.replace(chol=jnp.asarray(res.throw_matrix))

    keys = jax.random.split(jax.random.key(0), 3000)
    theta = jnp.zeros(3)
    props = np.asarray(jax.vmap(lambda k: propose_step(model, theta, k))(keys))
    emp = np.cov(props.T)
    expected = res.throw_matrix @ res.throw_matrix.T
    assert np.allclose(emp, expected, atol=0.12)

"""ops/gmm.py: fixed-shape on-device 1-D 2-component EM vs a numpy oracle.

The oracle is an independent loop-based implementation of the same EM
semantics (sklearn GaussianMixture full-covariance updates with the PAA
init: means at min/max, unit variances, equal weights, reg_covar floor).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_detection_tpu.ops.gmm import gmm_em_1d

LOG_2PI = float(np.log(2.0 * np.pi))


def np_gmm_em(x, valid, n_iter=25, reg_covar=1e-6):
    x = np.asarray(x, np.float64)
    v = np.asarray(valid, bool)
    xs = x[v]
    n = max(len(xs), 1)
    means = np.array([xs.min(), xs.max()]) if len(xs) else np.zeros(2)
    var = np.ones(2)
    w = np.full(2, 0.5)

    def weighted_logpdf(means, var, w):
        out = np.zeros((len(x), 2))
        for i in range(len(x)):
            for k in range(2):
                d = x[i] - means[k]
                out[i, k] = np.log(w[k]) - 0.5 * (LOG_2PI + np.log(var[k])) - 0.5 * d * d / var[k]
        return out

    def e_step(means, var, w):
        wlp = weighted_logpdf(means, var, w)
        m = wlp.max(axis=1, keepdims=True)
        log_norm = m[:, 0] + np.log(np.exp(wlp - m).sum(axis=1))
        resp = np.exp(wlp - log_norm[:, None]) * v[:, None]
        return resp, log_norm

    for _ in range(n_iter):
        resp, _ = e_step(means, var, w)
        nk = resp.sum(axis=0)
        nk_safe = np.maximum(nk, 1e-12)
        means = (resp * x[:, None]).sum(axis=0) / nk_safe
        var = (resp * (x[:, None] - means[None, :]) ** 2).sum(axis=0) / nk_safe + reg_covar
        w = np.maximum(nk / n, 1e-12)
    resp, log_norm = e_step(means, var, w)
    return resp, log_norm, means, var, w


@pytest.mark.core
class TestGMM:
    def test_matches_numpy_oracle(self):
        rng = np.random.RandomState(0)
        # two clear 1-D clusters + padding
        x = np.concatenate([rng.normal(0.5, 0.2, 12), rng.normal(4.0, 0.5, 8),
                            np.zeros(5)]).astype(np.float32)
        valid = np.concatenate([np.ones(20, bool), np.zeros(5, bool)])
        res = jax.jit(gmm_em_1d)(jnp.asarray(x), jnp.asarray(valid))
        resp_np, logp_np, means_np, var_np, w_np = np_gmm_em(x, valid)
        np.testing.assert_allclose(np.asarray(res.means), means_np, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(res.variances), var_np, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(res.weights), w_np, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(res.resp), resp_np, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(res.log_prob)[valid], logp_np[valid], rtol=1e-4
        )

    def test_separates_clusters(self):
        rng = np.random.RandomState(1)
        lo = rng.normal(0.2, 0.05, 10)
        hi = rng.normal(3.0, 0.3, 10)
        x = np.concatenate([lo, hi]).astype(np.float32)
        valid = np.ones(20, bool)
        res = gmm_em_1d(jnp.asarray(x), jnp.asarray(valid))
        comp = np.argmax(np.asarray(res.resp), axis=1)
        assert (comp[:10] == 0).all() and (comp[10:] == 1).all()
        assert float(res.means[0]) < float(res.means[1])

    def test_degenerate_single_sample(self):
        x = jnp.asarray(np.array([2.0] + [0.0] * 7, np.float32))
        valid = jnp.asarray(np.array([True] + [False] * 7))
        res = gmm_em_1d(x, valid)
        assert np.isfinite(np.asarray(res.means)).all()
        assert np.isfinite(np.asarray(res.log_prob)[0])
        # invalid rows carry zero responsibility
        np.testing.assert_array_equal(np.asarray(res.resp)[1:], 0.0)

    def test_no_valid_samples_finite(self):
        x = jnp.zeros((8,), jnp.float32)
        valid = jnp.zeros((8,), bool)
        res = gmm_em_1d(x, valid)
        assert np.isfinite(np.asarray(res.means)).all()
        assert np.isfinite(np.asarray(res.variances)).all()

    def test_identical_values_hit_reg_floor(self):
        x = jnp.full((10,), 1.5, jnp.float32)
        valid = jnp.ones((10,), bool)
        res = gmm_em_1d(x, valid)
        assert np.isfinite(np.asarray(res.log_prob)).all()
        assert (np.asarray(res.variances) >= 1e-6 - 1e-9).all()

    def test_vmaps_over_gts(self):
        rng = np.random.RandomState(2)
        xs = rng.normal(1.0, 1.0, (6, 16)).astype(np.float32)
        valid = rng.rand(6, 16) < 0.8
        valid[:, 0] = True
        out = jax.vmap(gmm_em_1d)(jnp.asarray(xs), jnp.asarray(valid))
        assert out.resp.shape == (6, 16, 2)
        for i in range(6):
            ref = np_gmm_em(xs[i], valid[i])
            np.testing.assert_allclose(np.asarray(out.means)[i], ref[2], rtol=1e-3, atol=1e-4)

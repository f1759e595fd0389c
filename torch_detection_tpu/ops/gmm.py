"""Fixed-shape 1-D two-component Gaussian-mixture EM, on device.

PAA (Kim & Lee, ECCV 2020) scores every candidate anchor by its current
detection loss and splits each ground truth's candidate set into
positives/negatives by fitting a 2-component 1-D GMM to the scores and
taking the low-loss component.  The official implementation ships the
scores to the host and calls ``sklearn.mixture.GaussianMixture`` per gt —
a host sync inside the train step.  Here the whole EM runs inside the
jitted step as a fixed-iteration ``lax.fori_loop`` over masked arrays, so
it vmaps over (batch x gt) and never leaves the device.

Reference lineage: the reference repo has no assignment tier at all
(/root/reference/core/__init__.py is empty — SURVEY.md §2 #32); this
follows sklearn's EM semantics (full covariance, ``reg_covar`` floor) with
the PAA initialization (means at min/max, unit precisions, equal weights).

TPU design notes:
* Fixed shapes: the candidate slate is (C,) with a validity mask; invalid
  rows get zero responsibility and drop out of every M-step sum.
* Fixed iteration count instead of sklearn's tol-based stop: EM on <=64
  1-D points converges in a handful of iterations, and a static trip count
  keeps the program free of data-dependent control flow (SURVEY §7 hard
  part (c): fixed-shape formulations of data-dependent ops).
* Everything is f32 elementwise math over tiny arrays — negligible next to
  the dense loss tier it feeds.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_LOG_2PI = 1.8378770664093453


class GMMResult(NamedTuple):
    """Per-candidate posterior and mixture parameters.

    ``resp``: (..., C, 2) responsibilities (rows for invalid candidates are
    0); ``log_prob``: (..., C) per-sample mixture log-likelihood (sklearn's
    ``score_samples``); ``means``/``variances``/``weights``: (..., 2).
    """

    resp: jax.Array
    log_prob: jax.Array
    means: jax.Array
    variances: jax.Array
    weights: jax.Array


def gmm_em_1d(
    x: jax.Array,  # (C,) sample values
    valid: jax.Array,  # (C,) bool
    n_iter: int = 25,
    reg_covar: float = 1e-6,
) -> GMMResult:
    """Fit a 2-component 1-D Gaussian mixture to the valid entries of ``x``.

    Initialization follows PAA / sklearn(means_init=[min, max],
    precisions_init=1, weights_init=0.5).  Behaves sensibly in the
    degenerate cases the fixed slate produces: with 0 or 1 valid samples
    the parameters stay near their init and downstream consumers mask on
    ``valid`` anyway.
    """
    x = x.astype(jnp.float32)
    # sanitize masked entries BEFORE any pdf math: a +-3e38 sentinel in a
    # padded slot overflows d*d to inf and exp(-inf - logsumexp(-inf)) is
    # NaN, which the v-mask multiplies as NaN*0 = NaN and poisons the fit
    x = jnp.where(valid, x, 0.0)
    v = valid.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(v), 1.0)
    big = jnp.float32(1e30)
    mean0 = jnp.min(jnp.where(valid, x, big))
    mean1 = jnp.max(jnp.where(valid, x, -big))
    # no valid samples: min/max are +-big sentinels; zero them for stability
    any_valid = jnp.any(valid)
    mean0 = jnp.where(any_valid, mean0, 0.0)
    mean1 = jnp.where(any_valid, mean1, 0.0)

    def log_pdf(means, variances, weights):
        # (C, 2) weighted component log densities
        d = x[:, None] - means[None, :]
        return (
            jnp.log(weights[None, :])
            - 0.5 * (_LOG_2PI + jnp.log(variances[None, :]))
            - 0.5 * d * d / variances[None, :]
        )

    def e_step(means, variances, weights):
        wlp = log_pdf(means, variances, weights)  # (C, 2)
        log_norm = jax.scipy.special.logsumexp(wlp, axis=1, keepdims=True)
        resp = jnp.exp(wlp - log_norm) * v[:, None]
        return resp, log_norm[:, 0]

    def m_step(resp):
        nk = jnp.sum(resp, axis=0)  # (2,)
        nk_safe = jnp.maximum(nk, 1e-12)
        means = jnp.sum(resp * x[:, None], axis=0) / nk_safe
        d = x[:, None] - means[None, :]
        variances = jnp.sum(resp * d * d, axis=0) / nk_safe + reg_covar
        weights = nk / n
        # an empty component keeps a tiny weight so its log stays finite;
        # its responsibilities then stay ~0 and it never recovers mass
        weights = jnp.maximum(weights, 1e-12)
        return means, variances, weights

    init = (
        jnp.stack([mean0, mean1]),
        jnp.ones((2,), jnp.float32),
        jnp.full((2,), 0.5, jnp.float32),
    )

    def body(_, params):
        resp, _ = e_step(*params)
        return m_step(resp)

    means, variances, weights = jax.lax.fori_loop(0, n_iter, body, init)
    resp, log_prob = e_step(means, variances, weights)
    return GMMResult(resp, log_prob, means, variances, weights)

"""Robust cost weighting and chi-square gates.

The reference uses g2o Huber kernels with per-edge deltas
(ref: src/Optimizer.cc:905-918 — deltaMono=sqrt(5.991), deltaStereo=sqrt(7.815);
 Thirdparty/g2o/g2o/core/robust_kernel_impl.cpp). In an IRLS Gauss-Newton the
Huber kernel becomes a per-residual weight w = rho'(e2); we expose that form.
"""

from __future__ import annotations

import jax.numpy as jnp

# 95% chi-square gates used throughout the reference
CHI2_MONO = 5.991  # 2 dof   (Optimizer.cc:905)
CHI2_STEREO = 7.815  # 3 dof (Optimizer.cc:917)


def huber_weight(chi2, delta2):
    """IRLS weight for the Huber kernel given squared error chi2.

    rho(e2) = e2                 if e2 <= delta2
              2*delta*sqrt(e2)-delta2  otherwise
    weight = rho'(e2) = min(1, delta/sqrt(e2)).
    """
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    delta = jnp.sqrt(delta2)
    return jnp.minimum(1.0, delta / e)


def huber_cost(chi2, delta2):
    """Robustified total cost rho(chi2)."""
    delta = jnp.sqrt(delta2)
    e = jnp.sqrt(jnp.maximum(chi2, 0.0))
    return jnp.where(chi2 <= delta2, chi2, 2.0 * delta * e - delta2)


def cauchy_weight(chi2, delta2):
    return 1.0 / (1.0 + chi2 / delta2)

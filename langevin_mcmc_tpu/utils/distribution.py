"""Piecewise-constant 1D distribution, built on host, sampled on device.

TPU-native counterpart of the reference's pbrt-style PiecewiseConstant1D
(reference src/distribution.h:8-63): the CDF is a device array and lookups
are jnp.searchsorted (vectorized over a batch of u's), instead of a pointer
std::upper_bound per call.
"""

import jax.numpy as jnp
import numpy as np


class Distribution1D:
    """CDF table over n weights. All query methods are jit-safe."""

    def __init__(self, weights):
        f = np.asarray(weights, np.float32)
        n = len(f)
        cdf = np.zeros(n + 1, np.float64)
        np.cumsum(f / n, out=cdf[1:])
        func_int = cdf[-1]
        if func_int == 0.0:
            cdf[:] = np.arange(n + 1) / n
        else:
            cdf /= func_int
        self.count = n
        self.func_int = float(func_int)
        self.func = jnp.asarray(f)
        self.cdf = jnp.asarray(cdf.astype(np.float32))

    # -- device-side queries (batched over u) --
    def sample_discrete(self, u):
        """Index with probability func[i]/(funcInt*n); returns (idx, pmf).

        Matches reference src/distribution.h:44-50 (upper_bound - 1).
        """
        idx = jnp.clip(jnp.searchsorted(self.cdf, u, side='right') - 1,
                       0, self.count - 1)
        pmf = self.func[idx] / jnp.float32(max(self.func_int * self.count, 1e-30))
        return idx, pmf

    def sample_continuous(self, u):
        """Continuous sample in [0,1); returns (x, pdf, idx)
        (reference src/distribution.h:31-43)."""
        idx = jnp.clip(jnp.searchsorted(self.cdf, u, side='right') - 1,
                       0, self.count - 1)
        lo = self.cdf[idx]
        hi = self.cdf[idx + 1]
        du = (u - lo) / jnp.where(hi > lo, hi - lo, 1.0)
        pdf = self.func[idx] / jnp.float32(max(self.func_int, 1e-30))
        return (idx.astype(jnp.float32) + du) / self.count, pdf, idx

    def pmf(self, idx):
        return self.func[idx] / jnp.float32(max(self.func_int * self.count, 1e-30))

    @property
    def normalization(self):
        return self.func_int * self.count

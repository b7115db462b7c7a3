"""1D piecewise-constant distributions (light picking).

TPU-native counterpart of /root/reference/src/sampler/sampling.jl:3-41.
The CDF is built on the host (tiny, per-scene); sampling is a vectorized
searchsorted over megabatches of u values.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

F32 = jnp.float32


class Distribution1D:
    def __init__(self, func):
        f = np.asarray(func, np.float32)
        n = f.size
        cdf = np.zeros(n + 1, np.float32)
        cdf[1:] = np.cumsum(f / n)
        self.func_int = float(cdf[-1])
        if self.func_int == 0.0:
            cdf[1:] = np.arange(1, n + 1, dtype=np.float32) / n
        else:
            cdf[1:] /= self.func_int
        self.func = f          # host numpy (jit embeds from host)
        self.cdf = np.asarray(cdf)
        self.n = n

    def sample_discrete(self, u):
        """Vectorized sample_discrete (sampling.jl:32-41).

        Returns (index [same shape as u], pdf, u_remapped); index is 0-based.
        """
        # offset = last index with cdf[offset] <= u  (0-based into cdf)
        # jnp.asarray on the host arrays: embeds as jit constants (free)
        # and keeps traced-offset gathers legal under jit.
        cdf, func = jnp.asarray(self.cdf), jnp.asarray(self.func)
        offset = jnp.clip(
            jnp.searchsorted(cdf, u, side="right") - 1, 0, self.n - 1
        )
        pdf = jnp.where(
            self.func_int > 0,
            func[offset] / (self.func_int * self.n),
            0.0,
        )
        c0 = cdf[offset]
        c1 = cdf[offset + 1]
        u_remapped = (u - c0) / jnp.where(c1 > c0, c1 - c0, 1.0)
        return offset.astype(jnp.int32), pdf, u_remapped

    def sample_continuous(self, u):
        """Continuous counterpart (PBRT SampleContinuous): returns
        (x in [0,1), pdf, index). The reference only uses the discrete
        variant; this completes the Distribution1D surface."""
        cdf, func = jnp.asarray(self.cdf), jnp.asarray(self.func)
        offset = jnp.clip(
            jnp.searchsorted(cdf, u, side="right") - 1, 0, self.n - 1
        )
        c0 = cdf[offset]
        c1 = cdf[offset + 1]
        du = (u - c0) / jnp.where(c1 > c0, c1 - c0, 1.0)
        pdf = jnp.where(
            self.func_int > 0, func[offset] / self.func_int, 0.0
        )
        x = (offset.astype(F32) + du) / self.n
        return x, pdf, offset.astype(jnp.int32)

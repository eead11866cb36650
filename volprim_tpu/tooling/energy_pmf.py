"""Discrete energy-proportional sampling (EnergyPMF).

Rebuild of the emissive-element sampler in
``/root/reference/scripts/radiosity/radiance_cache.py:30-181``: a discrete
distribution over elements weighted by their energy, with ``sample``,
``eval_pdf`` and a ``test`` self-check comparing empirical frequencies to
the pdf (:171-180).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EnergyPMF:
    pmf: jnp.ndarray  # [N]
    cdf: jnp.ndarray  # [N] inclusive

    @staticmethod
    def from_energies(energies: jnp.ndarray) -> "EnergyPMF":
        e = jnp.maximum(energies.reshape(-1), 0.0)
        total = jnp.maximum(jnp.sum(e), 1e-30)
        pmf = e / total
        return EnergyPMF(pmf=pmf, cdf=jnp.cumsum(pmf))

    def sample(self, key, shape=()) -> jnp.ndarray:
        u = jax.random.uniform(key, shape)
        idx = jnp.searchsorted(self.cdf, u)
        return jnp.clip(idx, 0, self.pmf.shape[0] - 1)

    def eval_pdf(self, idx: jnp.ndarray) -> jnp.ndarray:
        return self.pmf[idx]

    def test(self, key, n: int = 200000, tol: float = 0.02) -> bool:
        """Empirical-frequency self check (radiance_cache.py:171-180)."""
        idx = self.sample(key, (n,))
        hist = jnp.zeros_like(self.pmf).at[idx].add(1.0) / n
        return bool(jnp.max(jnp.abs(hist - self.pmf)) < tol)

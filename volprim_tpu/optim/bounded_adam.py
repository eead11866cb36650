"""Bounds-aware Adam optimizer.

Functional (jit-friendly) rebuild of the reference's BoundedAdam
(``/root/reference/volprim/optimizers.py:18-166``): per-key learning rates,
NaN-gradient zeroing (:88), optional masked updates and the UniformAdam
variant (:101-113), and bounds handling — when a step would cross a bound the
parameter moves half-way to the bound instead and that parameter's moments
are reset (:122-138).

Unlike the reference (which mutates dr.enable_grad'd variables in place), the
step is pure: ``(params, grads, state) -> (params, state)``, so it composes
with jit / grad / shard_map.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AdamState:
    m: Dict[str, jnp.ndarray]
    v: Dict[str, jnp.ndarray]
    t: Dict[str, jnp.ndarray]


class BoundedAdam:
    def __init__(
        self,
        lr: float = 1e-3,
        beta_1: float = 0.9,
        beta_2: float = 0.999,
        epsilon: float = 1e-8,
        mask_updates: bool = False,
        uniform: bool = False,
    ):
        assert 0 <= beta_1 < 1 and 0 <= beta_2 < 1 and lr > 0 and epsilon > 0
        self.lr_default = lr
        self.lr: Dict[str, float] = {}
        self.beta_1 = beta_1
        self.beta_2 = beta_2
        self.epsilon = epsilon
        self.mask_updates = mask_updates
        self.uniform = uniform
        self.bounds: Dict[str, Tuple[Optional[float], Optional[float]]] = {}

    def set_learning_rate(self, lr):
        """Scalar or {key: lr} (mirrors mi.ad.Optimizer.set_learning_rate)."""
        if isinstance(lr, dict):
            self.lr.update(lr)
        else:
            self.lr_default = float(lr)

    def set_bounds(self, key: str, lower: float = None, upper: float = None):
        """optimizers.py:65-70."""
        assert lower is None or upper is None or lower < upper, (
            f"set_bounds({key!r}): lower ({lower}) must be < upper ({upper}); "
            "check the argument order"
        )
        self.bounds[key] = (upper, lower)

    def init(self, params: Dict[str, jnp.ndarray]) -> AdamState:
        zeros = {k: jnp.zeros_like(p) for k, p in params.items()}
        return AdamState(
            m=dict(zeros),
            v={k: jnp.zeros_like(p) for k, p in params.items()},
            t={k: jnp.zeros((), jnp.int32) for k in params},
        )

    def step(
        self,
        params: Dict[str, jnp.ndarray],
        grads: Dict[str, jnp.ndarray],
        state: AdamState,
        active: Optional[Dict[str, jnp.ndarray]] = None,
    ) -> tuple[Dict[str, jnp.ndarray], AdamState]:
        """Take one gradient step (optimizers.py:72-146). Jittable."""
        active = active or {}
        new_params, new_m, new_v, new_t = {}, {}, {}, {}
        for k, p in params.items():
            g = grads[k]
            g = jnp.where(jnp.isnan(g), 0.0, g)  # :88

            t = state.t[k] + 1
            tf = t.astype(jnp.float32)
            lr_scale = jnp.sqrt(1.0 - self.beta_2**tf) / (1.0 - self.beta_1**tf)
            lr_t = self.lr.get(k, self.lr_default) * lr_scale

            m_t = self.beta_1 * state.m[k] + (1.0 - self.beta_1) * g
            v_t = self.beta_2 * state.v[k] + (1.0 - self.beta_2) * g * g

            mask = active.get(k)
            if self.mask_updates:
                gm = g != 0.0
                mask = gm if mask is None else (mask & gm)
            if mask is not None:
                m_t = jnp.where(mask, m_t, state.m[k])
                v_t = jnp.where(mask, v_t, state.v[k])

            if self.uniform:  # :110-113
                step = lr_t * m_t / (jnp.sqrt(jnp.max(v_t)) + self.epsilon)
            else:
                step = lr_t * m_t / (jnp.sqrt(v_t) + self.epsilon)
            if mask is not None:
                step = jnp.where(mask, step, 0.0)

            v_cur = p
            u = v_cur - step

            if k in self.bounds:  # :122-138
                upper, lower = self.bounds[k]
                over = jnp.zeros_like(u, bool)
                if upper is not None:
                    ob = u >= upper
                    v_cur = jnp.where(ob & (v_cur >= upper), upper, v_cur)
                    u = jnp.where(ob, v_cur + 0.5 * (upper - v_cur), u)
                    over = ob
                if lower is not None:
                    ob = u <= lower
                    v_cur = jnp.where(ob & (v_cur <= lower), lower, v_cur)
                    u = jnp.where(ob, v_cur - 0.5 * (v_cur - lower), u)
                    over = over | ob
                m_t = jnp.where(over, 0.0, m_t)
                v_t = jnp.where(over, 0.0, v_t)

            new_params[k] = u
            new_m[k], new_v[k], new_t[k] = m_t, v_t, t
        return new_params, AdamState(new_m, new_v, new_t)

    def reset(self, state: AdamState, key: str) -> AdamState:
        """Zero a key's moments (optimizers.py:148-156); used when a
        parameter's shape changes (pruning)."""
        m = dict(state.m)
        v = dict(state.v)
        t = dict(state.t)
        m[key] = jnp.zeros_like(m[key])
        v[key] = jnp.zeros_like(v[key])
        t[key] = jnp.zeros((), jnp.int32)
        return AdamState(m, v, t)


def save_state(path: str, params: Dict, state: AdamState):
    """Training-state checkpoint (params + moments) as an .npz — the resume
    capability the reference lacks (SURVEY.md §5: optimizer state is not
    checkpointed there)."""
    payload = {}
    for k, p in params.items():
        payload[f"param/{k}"] = np.asarray(p)
        payload[f"m/{k}"] = np.asarray(state.m[k])
        payload[f"v/{k}"] = np.asarray(state.v[k])
        payload[f"t/{k}"] = np.asarray(state.t[k])
    np.savez(path, **payload)


def load_state(path: str) -> tuple[Dict, AdamState]:
    data = np.load(path)
    params, m, v, t = {}, {}, {}, {}
    for full in data.files:
        kind, key = full.split("/", 1)
        arr = jnp.asarray(data[full])
        {"param": params, "m": m, "v": v, "t": t}[kind][key] = arr
    return params, AdamState(m, v, t)

"""Surface BSDFs on interpolated vertex attributes (Principled + Diffuse).

TPU-native rebuild of the radiosity suite's vertex-attribute BSDFs
(``/root/reference/scripts/radiosity/vertex_bsdf.py:26-347`` and the
helpers in ``bsdf_utils.py:11-92``): the Mitsuba Principled BRDF restricted
to its reflection lobes (GGX specular reflection + diffuse/retro; no
transmission/clearcoat/sheen — exactly the subset the reference implements)
with material parameters supplied per *shading point* (a dict of arrays, as
produced by barycentric vertex-attribute interpolation) instead of texture
lookups.

All directions are in the local shading frame (z = shading normal),
pointing away from the surface: ``wi`` toward the viewer, ``wo`` the
sampled/queried outgoing direction — Mitsuba's convention. ``eval`` returns
BSDF value *times* |cos_theta_o| (vertex_bsdf.py:133-140), ``sample``
returns (wo, pdf, weight = eval/pdf).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

_INV_PI = 1.0 / jnp.pi


# ---------------------------------------------------------------------------
# Frames
# ---------------------------------------------------------------------------


def make_frame(n: jnp.ndarray):
    """Branchless ONB around n ([..., 3]). Returns (t, b, n)."""
    nz = n[..., 2]
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + sign * n[..., 0] ** 2 * a, sign * b, -sign * n[..., 0]], axis=-1
    )
    bt = jnp.stack([b, sign + n[..., 1] ** 2 * a, -n[..., 1]], axis=-1)
    return t, bt, n


def to_local(n: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    t, b, nn = make_frame(n)
    return jnp.stack(
        [
            jnp.sum(v * t, axis=-1),
            jnp.sum(v * b, axis=-1),
            jnp.sum(v * nn, axis=-1),
        ],
        axis=-1,
    )


def to_world(n: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    t, b, nn = make_frame(n)
    return v[..., 0:1] * t + v[..., 1:2] * b + v[..., 2:3] * nn


# ---------------------------------------------------------------------------
# Fresnel / Schlick helpers (bsdf_utils.py:38-92)
# ---------------------------------------------------------------------------


def fresnel_dielectric(cos_theta_i: jnp.ndarray, eta: float) -> jnp.ndarray:
    """Unpolarized dielectric Fresnel reflectance (mi.fresnel's F)."""
    outside = cos_theta_i >= 0.0
    eta_ti = jnp.where(outside, 1.0 / eta, eta)
    ci = jnp.abs(cos_theta_i)
    ct2 = 1.0 - (1.0 - ci * ci) * eta_ti * eta_ti
    tir = ct2 <= 0.0
    ct = jnp.sqrt(jnp.maximum(ct2, 0.0))
    e_it = jnp.where(outside, eta, 1.0 / eta)
    r_s = (ci - e_it * ct) / jnp.maximum(ci + e_it * ct, 1e-12)
    r_p = (e_it * ci - ct) / jnp.maximum(e_it * ci + ct, 1e-12)
    f = 0.5 * (r_s * r_s + r_p * r_p)
    return jnp.where(tir, 1.0, f)


def schlick_r0_eta(eta) -> jnp.ndarray:
    return jnp.square((eta - 1.0) / (eta + 1.0))


def schlick_weight(cos_i: jnp.ndarray) -> jnp.ndarray:
    m = jnp.clip(1.0 - cos_i, 0.0, 1.0)
    return jnp.square(jnp.square(m)) * m


def calc_schlick(r0, cos_theta_i: jnp.ndarray, eta: float):
    """Schlick approximation with the refraction-side branch
    (bsdf_utils.py:45-57)."""
    outside = cos_theta_i >= 0.0
    eta_ti = jnp.where(outside, 1.0 / eta, eta)
    ct2 = 1.0 - (1.0 - cos_theta_i * cos_theta_i) * eta_ti * eta_ti
    ct = jnp.sqrt(jnp.maximum(ct2, 0.0))
    w_out = schlick_weight(jnp.abs(cos_theta_i))
    w_in = schlick_weight(ct)
    w = jnp.where(jnp.asarray(eta) > 1.0, w_out, w_in)
    if jnp.ndim(r0) and jnp.shape(r0)[-1] == 3 and jnp.ndim(w) < jnp.ndim(r0):
        w = w[..., None]
    return r0 + (1.0 - r0) * w  # lerp(w, 1, r0) on the reflectance axis


def principled_fresnel(
    f_dielectric, metallic, spec_tint, base_color, lum, cos_theta_i,
    front_side, eta: float, has_metallic: bool, has_spec_tint: bool,
):
    """bsdf_utils.py:59-92 with the transmission weight fixed to 0."""
    f_schlick = jnp.zeros_like(base_color)
    if has_metallic:
        f_schlick = f_schlick + metallic[..., None] * calc_schlick(
            base_color, cos_theta_i, eta
        )
    if has_spec_tint:
        c_tint = jnp.where(
            lum[..., None] > 0.0, base_color / jnp.maximum(lum[..., None], 1e-12), 1.0
        )
        outside = cos_theta_i >= 0.0
        eta_it = jnp.where(outside, eta, 1.0 / eta)
        f0 = c_tint * schlick_r0_eta(eta_it)[..., None]
        f_schlick = f_schlick + (1.0 - metallic[..., None]) * spec_tint[
            ..., None
        ] * calc_schlick(f0, cos_theta_i, eta)
    f_front = (
        (1.0 - metallic[..., None]) * (1.0 - spec_tint[..., None])
        * f_dielectric[..., None]
        + f_schlick
    )
    return jnp.where(front_side[..., None], f_front, 0.0)


# ---------------------------------------------------------------------------
# GGX microfacet distribution (anisotropic, visible-normal sampling)
# ---------------------------------------------------------------------------


def _dist_params(anisotropic, roughness, has_anisotropic: bool):
    r2 = jnp.square(roughness)
    if not has_anisotropic:
        a = jnp.maximum(0.001, r2)
        return a, a
    aspect = jnp.sqrt(1.0 - 0.9 * anisotropic)
    return (
        jnp.maximum(0.001, r2 / aspect),
        jnp.maximum(0.001, r2 * aspect),
    )


def ggx_d(m: jnp.ndarray, ax, ay) -> jnp.ndarray:
    s = (
        jnp.square(m[..., 0] / ax)
        + jnp.square(m[..., 1] / ay)
        + jnp.square(m[..., 2])
    )
    return jnp.where(
        m[..., 2] > 0.0, _INV_PI / (ax * ay * jnp.maximum(s * s, 1e-20)), 0.0
    )


def ggx_g1(v: jnp.ndarray, ax, ay) -> jnp.ndarray:
    xy = jnp.square(ax * v[..., 0]) + jnp.square(ay * v[..., 1])
    z2 = jnp.square(v[..., 2])
    return 2.0 / (1.0 + jnp.sqrt(1.0 + xy / jnp.maximum(z2, 1e-20)))


def ggx_sample_vndf(wi: jnp.ndarray, ax, ay, sample2: jnp.ndarray):
    """Heitz 2018 visible-normal sampling (Mitsuba's GGX sample())."""
    v = jnp.stack(
        [ax * wi[..., 0], ay * wi[..., 1], wi[..., 2]], axis=-1
    )
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    lensq = v[..., 0] ** 2 + v[..., 1] ** 2
    inv = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-20))
    t1 = jnp.where(
        (lensq > 1e-20)[..., None],
        jnp.stack([-v[..., 1] * inv, v[..., 0] * inv, jnp.zeros_like(inv)], -1),
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), v.shape),
    )
    t2 = jnp.cross(v, t1)
    r = jnp.sqrt(sample2[..., 0])
    phi = 2.0 * jnp.pi * sample2[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + v[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    p3 = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    nh = p1[..., None] * t1 + p2[..., None] * t2 + p3[..., None] * v
    m = jnp.stack(
        [ax * nh[..., 0], ay * nh[..., 1], jnp.maximum(nh[..., 2], 1e-6)], -1
    )
    return m / jnp.maximum(jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-12)


def ggx_pdf_visible(wi: jnp.ndarray, m: jnp.ndarray, ax, ay) -> jnp.ndarray:
    """pdf of m under VNDF sampling from wi (both local, wi.z > 0)."""
    g1 = ggx_g1(wi, ax, ay)
    d = ggx_d(m, ax, ay)
    return g1 * d * jnp.abs(jnp.sum(wi * m, axis=-1)) / jnp.maximum(
        jnp.abs(wi[..., 2]), 1e-12
    )


def _mac_mic_compat(m, wi, wo, cos_theta_i):
    ms = m * jnp.sign(cos_theta_i)[..., None]
    return (jnp.sum(wi * ms, -1) > 0.0) & (jnp.sum(wo * ms, -1) > 0.0)


def _mulsign(v, s):
    return v * jnp.sign(jnp.where(s == 0.0, 1.0, s))[..., None]


# ---------------------------------------------------------------------------
# Principled BRDF (reflection lobes; vertex_bsdf.py:26-347)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Principled:
    """Reflection-only Principled BRDF over per-point attribute dicts.

    attrs keys: 'base_color' [...,3], 'roughness' [...]; optional
    'metallic', 'anisotropic', 'spec_tint' [...] when the matching flag is
    set (vertex_bsdf.py:352-371)."""

    has_metallic: bool = True
    has_anisotropic: bool = False
    has_spec_tint: bool = False
    specular: float = 0.5

    @property
    def eta(self) -> float:
        return 2.0 / (1.0 - (0.08 * self.specular) ** 0.5) - 1.0

    def attr_names(self):
        """Vertex-attribute names this model interpolates
        (vertex_bsdf.py:380-435's param_keys, sans prefix)."""
        names = ["base_color", "roughness"]
        if self.has_metallic:
            names.append("metallic")
        if self.has_anisotropic:
            names.append("anisotropic")
        if self.has_spec_tint:
            names.append("spec_tint")
        return names

    def _params(self, attrs: Dict[str, jnp.ndarray]):
        rough = attrs["roughness"]
        metal = attrs["metallic"] if self.has_metallic else jnp.zeros_like(rough)
        aniso = (
            attrs["anisotropic"] if self.has_anisotropic else jnp.zeros_like(rough)
        )
        tint = attrs["spec_tint"] if self.has_spec_tint else jnp.zeros_like(rough)
        return attrs["base_color"], rough, metal, aniso, tint

    def eval(self, attrs, wi, wo, active=True):
        """f(wi, wo) * |cos_theta_o| (vertex_bsdf.py bsdf_eval)."""
        base, rough, metal, aniso, tint = self._params(attrs)
        eta = self.eta
        cti = wi[..., 2]
        cto = wo[..., 2]
        active = active & (cti != 0.0)
        reflect = cti * cto > 0.0
        front = cti > 0.0
        brdf = 1.0 - metal

        ax, ay = _dist_params(aniso, rough, self.has_anisotropic)
        wh = wi + wo  # reflection-only: eta factor = 1
        wh = wh / jnp.maximum(jnp.linalg.norm(wh, axis=-1, keepdims=True), 1e-12)
        wh = _mulsign(wh, wh[..., 2])

        f_diel = fresnel_dielectric(jnp.sum(wi * wh, -1), eta)
        compat = _mac_mic_compat(wh, wi, wo, cti)
        spec_act = active & reflect & compat & (f_diel > 0.0)
        diff_act = active & (brdf > 0.0) & reflect & front

        d = ggx_d(wh, ax, ay)
        g = ggx_g1(wi, ax, ay) * ggx_g1(wo, ax, ay)
        lum = (
            0.2126 * base[..., 0] + 0.7152 * base[..., 1] + 0.0722 * base[..., 2]
            if self.has_spec_tint
            else jnp.ones_like(rough)
        )
        f_pr = principled_fresnel(
            f_diel, metal, tint, base, lum, jnp.sum(wi * wh, -1), front, eta,
            self.has_metallic, self.has_spec_tint,
        )
        value = jnp.where(
            spec_act[..., None],
            f_pr * (d * g / (4.0 * jnp.maximum(jnp.abs(cti), 1e-12)))[..., None],
            0.0,
        )

        fo = schlick_weight(jnp.abs(cto))
        fi = schlick_weight(jnp.abs(cti))
        f_diff = (1.0 - 0.5 * fi) * (1.0 - 0.5 * fo)
        ctd = jnp.sum(wh * wo, -1)
        rr = 2.0 * rough * jnp.square(ctd)
        f_retro = rr * (fo + fi + fo * fi * (rr - 1.0))
        value = value + jnp.where(
            diff_act[..., None],
            (brdf * jnp.abs(cto) * _INV_PI * (f_diff + f_retro))[..., None]
            * base,
            0.0,
        )
        return jnp.where(active[..., None], value, 0.0)

    def pdf(self, attrs, wi, wo, active=True):
        base, rough, metal, aniso, tint = self._params(attrs)
        eta = self.eta
        cti = wi[..., 2]
        cto = wo[..., 2]
        active = active & (cti != 0.0)
        front = cti > 0.0
        reflect = cti * cto > 0.0
        brdf = 1.0 - metal

        wh = wi + wo
        wh = wh / jnp.maximum(jnp.linalg.norm(wh, axis=-1, keepdims=True), 1e-12)
        wh = _mulsign(wh, wh[..., 2])
        ax, ay = _dist_params(aniso, rough, self.has_anisotropic)
        f_diel = fresnel_dielectric(jnp.sum(wi * wh, -1), eta)

        prob_spec = jnp.where(front, 1.0, f_diel)
        prob_diff = jnp.where(front, brdf, 0.0)
        rcp = 1.0 / jnp.maximum(prob_spec + prob_diff, 1e-12)
        prob_spec = prob_spec * rcp
        prob_diff = prob_diff * rcp

        dwh_dwo = jnp.abs(
            1.0 / jnp.maximum(4.0 * jnp.abs(jnp.sum(wo * wh, -1)), 1e-12)
        )
        compat = _mac_mic_compat(wh, wi, wo, cti) & reflect
        pdf = jnp.where(
            compat,
            prob_spec * ggx_pdf_visible(_mulsign(wi, cti), wh, ax, ay) * dwh_dwo,
            0.0,
        )
        cos_pdf = jnp.abs(cto) * _INV_PI
        pdf = pdf + jnp.where(reflect, prob_diff * cos_pdf, 0.0)
        return jnp.where(active, pdf, 0.0)

    def sample(self, attrs, wi, key, active=True):
        """Returns (wo, pdf, weight=eval/pdf) — vertex_bsdf.py bsdf_sample."""
        base, rough, metal, aniso, tint = self._params(attrs)
        cti = wi[..., 2]
        active = active & (cti > 0.0)  # BRDF-only: front side
        k1, k2 = jax.random.split(key)
        s1 = jax.random.uniform(k1, cti.shape)
        s2 = jax.random.uniform(k2, cti.shape + (2,))

        ax, ay = _dist_params(aniso, rough, self.has_anisotropic)
        m = ggx_sample_vndf(_mulsign(wi, cti), ax, ay, s2)
        f_diel = fresnel_dielectric(jnp.sum(wi * m, -1), self.eta)

        brdf = 1.0 - metal
        prob_spec = jnp.ones_like(cti)
        prob_diff = jnp.where(cti > 0.0, brdf, 0.0)
        prob_diff = prob_diff / jnp.maximum(prob_spec + prob_diff, 1e-12)
        pick_diff = active & (s1 < prob_diff)

        # specular: reflect about m; diffuse: cosine hemisphere (re-using s2
        # like the reference, vertex_bsdf.py:330-344)
        wo_spec = 2.0 * jnp.sum(wi * m, -1, keepdims=True) * m - wi
        z = jnp.sqrt(jnp.maximum(1.0 - s2[..., 0], 0.0))
        r = jnp.sqrt(s2[..., 0])
        phi = 2.0 * jnp.pi * s2[..., 1]
        wo_diff = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)
        wo = jnp.where(pick_diff[..., None], wo_diff, wo_spec)

        reflect = cti * wo[..., 2] > 0.0
        ok_spec = _mac_mic_compat(m, wi, wo, cti) & reflect
        active = active & jnp.where(pick_diff, reflect, ok_spec)

        pdf = self.pdf(attrs, wi, wo, active)
        active = active & (pdf > 0.0)
        val = self.eval(attrs, wi, wo, active)
        w = jnp.where(
            active[..., None], val / jnp.maximum(pdf, 1e-20)[..., None], 0.0
        )
        return wo, jnp.where(active, pdf, 0.0), w


@dataclasses.dataclass(frozen=True)
class Diffuse:
    """Lambertian with per-point 'base_color' (vertex_bsdf.py:437-478)."""

    def attr_names(self):
        return ["base_color"]

    def eval(self, attrs, wi, wo, active=True):
        act = active & (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0)
        val = attrs["base_color"] * (_INV_PI * wo[..., 2])[..., None]
        return jnp.where(act[..., None], val, 0.0)

    def pdf(self, attrs, wi, wo, active=True):
        pdf = jnp.abs(wo[..., 2]) * _INV_PI
        return jnp.where(
            (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0) & active, pdf, 0.0
        )

    def sample(self, attrs, wi, key, active=True):
        act = active & (wi[..., 2] > 0.0)
        s2 = jax.random.uniform(key, wi.shape[:-1] + (2,))
        z = jnp.sqrt(jnp.maximum(1.0 - s2[..., 0], 0.0))
        r = jnp.sqrt(s2[..., 0])
        phi = 2.0 * jnp.pi * s2[..., 1]
        wo = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)
        pdf = jnp.where(act, jnp.abs(wo[..., 2]) * _INV_PI, 0.0)
        w = jnp.where(act[..., None], attrs["base_color"], 0.0)
        return wo, pdf, w

"""Film reconstruction filters + utils coverage.

Covers ``ops/filters.py`` (the hdrfilm/rfilter replacement, SURVEY.md §2.3),
``utils/misc.py`` (reference utils.py:15-47), and ``utils/benchmark.py``
(the KernelHistory-analogue compile/execute split, reference
benchmark.py:18-259) — the three modules previously exercised only
indirectly through the examples.
"""

import jax
import jax.numpy as jnp
import numpy as np

from volprim_tpu.ops import filters
from volprim_tpu.utils import benchmark, misc


# ---------------------------------------------------------------- filters


def test_splat_box_bins_and_develop_averages():
    # Two samples in pixel (y=1, x=2), one in (0, 0).
    px = jnp.array([2.3, 2.9, 0.1])
    py = jnp.array([1.5, 1.1, 0.4])
    vals = jnp.array([[1.0, 0.0], [3.0, 0.0], [5.0, 2.0]])
    img, wgt = filters.splat_box(vals, px, py, width=4, height=3)
    assert img.shape == (3, 4, 2) and wgt.shape == (3, 4)
    np.testing.assert_allclose(np.asarray(wgt[1, 2]), 2.0)
    np.testing.assert_allclose(np.asarray(wgt[0, 0]), 1.0)
    dev = filters.develop(img, wgt)
    # Box-developed pixel = mean of its samples.
    np.testing.assert_allclose(np.asarray(dev[1, 2]), [2.0, 0.0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dev[0, 0]), [5.0, 2.0], rtol=1e-6)


def test_splat_box_clips_out_of_bounds_coords():
    px = jnp.array([-7.0, 99.0])
    py = jnp.array([-1.0, 99.0])
    vals = jnp.ones((2, 1))
    img, wgt = filters.splat_box(vals, px, py, width=4, height=3)
    # Clipped into the corner pixels, not dropped.
    assert float(wgt[0, 0]) == 1.0 and float(wgt[2, 3]) == 1.0
    assert float(jnp.sum(wgt)) == 2.0


def test_splat_tent_at_pixel_center_is_a_delta():
    # Pixel centers are at integer + 0.5: a sample exactly there puts all
    # of its weight on that single pixel.
    px = jnp.array([2.5])
    py = jnp.array([1.5])
    vals = jnp.array([[4.0]])
    img, wgt = filters.splat_tent(vals, px, py, width=5, height=4)
    np.testing.assert_allclose(np.asarray(wgt[1, 2]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jnp.sum(wgt)), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(img[1, 2]), [4.0], rtol=1e-6)


def test_splat_tent_splits_bilinearly_and_conserves_weight():
    # Halfway between the centers of (1,1), (1,2), (2,1), (2,2): 1/4 each.
    px = jnp.array([2.0])
    py = jnp.array([2.0])
    vals = jnp.array([[8.0]])
    img, wgt = filters.splat_tent(vals, px, py, width=4, height=4)
    for yi, xi in ((1, 1), (1, 2), (2, 1), (2, 2)):
        np.testing.assert_allclose(np.asarray(wgt[yi, xi]), 0.25, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jnp.sum(wgt)), 1.0, atol=1e-6)
    # develop() recovers the sample value where full weight support exists.
    dev = filters.develop(img, wgt)
    np.testing.assert_allclose(np.asarray(dev[1, 1]), [8.0], rtol=1e-6)


def test_splat_tent_drops_weight_outside_film():
    # A sample in the corner pixel near the border: the taps that fall
    # outside the film are dropped (no wraparound / leakage), so the
    # total accumulated weight is < 1 but everything stays in-bounds.
    px = jnp.array([0.25])
    py = jnp.array([0.25])
    vals = jnp.array([[1.0]])
    img, wgt = filters.splat_tent(vals, px, py, width=3, height=3)
    total = float(jnp.sum(wgt))
    assert 0.0 < total < 1.0
    # Only the 2x2 in-bounds neighborhood of (0,0) may receive weight.
    assert float(jnp.sum(wgt[2:, :])) == 0.0
    assert float(jnp.sum(wgt[:, 2:])) == 0.0


def test_develop_zero_weight_pixels_are_finite():
    img = jnp.zeros((2, 2, 3))
    wgt = jnp.zeros((2, 2))
    dev = filters.develop(img, wgt)
    assert bool(jnp.all(jnp.isfinite(dev)))
    np.testing.assert_allclose(np.asarray(dev), 0.0)


def test_splat_is_differentiable_in_sample_values():
    # The film splat sits on the training path (optimize through the
    # developed image) — gradients must flow through scatter-add + develop.
    px = jnp.array([0.5, 1.5])
    py = jnp.array([0.5, 0.5])

    def loss(vals):
        img, wgt = filters.splat_tent(vals, px, py, width=2, height=1)
        return jnp.sum(filters.develop(img, wgt) ** 2)

    vals = jnp.array([[3.0], [5.0]])
    g = jax.grad(loss)(vals)
    # Delta splats at pixel centers: d/dv sum((v)^2) = 2v per sample.
    np.testing.assert_allclose(np.asarray(g), [[6.0], [10.0]], rtol=1e-5)


# ------------------------------------------------------------------- misc


def test_concatenate_images_side_by_side():
    a = np.zeros((4, 3, 3), np.float32)
    b = np.ones((4, 5, 3), np.float32)
    out = misc.concatenate_images([a, b])
    assert out.shape == (4, 8, 3)
    np.testing.assert_allclose(out[:, :3], 0.0)
    np.testing.assert_allclose(out[:, 3:], 1.0)
    # Reference-compatible alias (volprim.utils.concatenate_tensors).
    assert misc.concatenate_tensors is misc.concatenate_images


def test_concatenate_images_accepts_jax_arrays():
    a = jnp.zeros((2, 2, 3))
    b = jnp.ones((2, 2, 3))
    out = misc.concatenate_images([a, b])
    assert isinstance(out, np.ndarray) and out.shape == (2, 4, 3)


def test_time_operation_prints_label(capsys):
    with misc.time_operation("unit-op"):
        pass
    out = capsys.readouterr().out
    assert "unit-op" in out and "ms" in out


# -------------------------------------------------------------- benchmark


def test_measure_compile_execute_split():
    def f(x):
        return jnp.sum(x * 2.0)

    x = jnp.ones((128,))
    res = benchmark.measure(f, x, label="double-sum", nb_runs=3, log=False)
    assert res.label == "double-sum"
    assert res.compile_ms > 0.0
    assert len(res.runs) == 3
    assert res.execute_ms_mean > 0.0 and res.execute_ms_std >= 0.0
    # mrays helper: rays / seconds.
    mr = res.mrays_per_sec(num_rays=1_000_000)
    np.testing.assert_allclose(mr, 1e6 / (res.execute_ms_mean * 1e-3) / 1e6)
    assert "double-sum" in repr(res)


def test_measure_static_argnums():
    def f(x, n):
        return x * n

    x = jnp.ones((8,))
    res = benchmark.measure(f, x, 3, nb_runs=1, static_argnums=(1,), log=False)
    assert res.execute_ms_mean > 0.0


def test_single_run_prints(capsys):
    with benchmark.single_run("one-shot"):
        jnp.zeros((4,)).block_until_ready()
    out = capsys.readouterr().out
    assert "one-shot" in out and "ms" in out

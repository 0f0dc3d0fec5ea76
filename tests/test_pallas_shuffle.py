"""Interpret-mode equivalence tests for the opt-in Pallas shuffle kernels
(`ops/pallas/shuffle.py`) and the opt-in strided max pool
(`models/blocks.py::_max_pool_strided`).

These kernels are default-OFF (measured net-negative in the full train step,
see BASELINE.md r4 A/B table) but remain reachable via
BIAPY_TPU_PALLAS_SHUFFLE / BIAPY_TPU_POOL env knobs — VERDICT r4 weak #4
requires every knob-reachable path pinned. On the CPU test backend the
pallas_calls run in interpret mode (`shuffle._interpret()`), which executes
the same BlockSpec/grid program without Mosaic.

Semantics verified against pure-jnp references, forward AND custom VJP:
- zcat:   out[r, :, :, t*c:(t+1)*c] = x[r + t - kz//2] (zero outside rows)
- pool_max_folded: non-overlapping (wz, wy, wx) max on folded rows
- zd2s:   out[r*sz + a] = x[r, :, :, a*c:(a+1)*c]
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from biapy_tpu.ops.pallas.shuffle import pool_max_folded, zcat, zd2s  # noqa: E402


def _zcat_ref(x, kz):
    rows = x.shape[0]
    hz = kz // 2
    taps = []
    for t in range(kz):
        shift = t - hz
        rolled = jnp.roll(x, -shift, axis=0)
        idx = jnp.arange(rows) + shift
        mask = ((idx >= 0) & (idx < rows)).reshape(-1, 1, 1, 1)
        taps.append(jnp.where(mask, rolled, 0.0))
    return jnp.concatenate(taps, axis=-1)


def _pool_ref(x, win):
    wz, wy, wx = win
    rows, h, w, c = x.shape
    xr = x.reshape(rows // wz, wz, h // wy, wy, w // wx, wx, c)
    return xr.max(axis=(1, 3, 5))


def _zd2s_ref(x, sz):
    rows, h, w, szc = x.shape
    c = szc // sz
    # out[r*sz + a] = x[r, :, :, a*c:(a+1)*c]
    return x.reshape(rows, h, w, sz, c).transpose(0, 3, 1, 2, 4).reshape(
        rows * sz, h, w, c)


def _unique_rand(shape, seed=0):
    """Random floats with all-distinct values (no max-pool ties, so the
    eq-mask backward equals jax's autodiff of the reference)."""
    rng = np.random.default_rng(seed)
    flat = rng.permutation(np.prod(shape)).astype(np.float32)
    return (flat / flat.size + rng.standard_normal() * 0).reshape(shape)


@pytest.mark.parametrize("kz", [3, 5])
def test_zcat_forward_matches_reference(kz):
    x = jnp.asarray(_unique_rand((6, 8, 8, 3), seed=kz))
    got = zcat(x, kz)
    want = _zcat_ref(x, kz)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=0)


@pytest.mark.parametrize("kz", [3, 5])
def test_zcat_vjp_matches_reference(kz):
    x = jnp.asarray(_unique_rand((6, 8, 8, 2), seed=10 + kz))
    g = jnp.asarray(_unique_rand((6, 8, 8, 2 * kz), seed=20 + kz))

    _, vjp = jax.vjp(lambda v: zcat(v, kz), x)
    _, vjp_ref = jax.vjp(lambda v: _zcat_ref(v, kz), x)
    np.testing.assert_allclose(np.asarray(vjp(g)[0]),
                               np.asarray(vjp_ref(g)[0]), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("win", [(2, 2, 2), (1, 2, 2), (2, 1, 1)])
def test_pool_max_folded_forward_matches_reference(win):
    x = jnp.asarray(_unique_rand((4, 8, 8, 3), seed=sum(win)))
    got = pool_max_folded(x, win)
    want = _pool_ref(x, win)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=0)


@pytest.mark.parametrize("win", [(2, 2, 2), (1, 2, 2)])
def test_pool_max_folded_vjp_matches_reference(win):
    # unique values -> no ties -> eq-mask backward == jax grad of the max
    x = jnp.asarray(_unique_rand((4, 8, 8, 3), seed=30 + sum(win)))
    wz, wy, wx = win
    g = jnp.asarray(_unique_rand((4 // wz, 8 // wy, 8 // wx, 3),
                                 seed=40 + sum(win)))

    _, vjp = jax.vjp(lambda v: pool_max_folded(v, win), x)
    _, vjp_ref = jax.vjp(lambda v: _pool_ref(v, win), x)
    np.testing.assert_allclose(np.asarray(vjp(g)[0]),
                               np.asarray(vjp_ref(g)[0]), rtol=1e-6, atol=1e-6)


def test_pool_max_folded_tie_routing_documented():
    """On ties the eq-mask routes the FULL cotangent to every tied slot
    (documented deviation, models/blocks.py _max_pool_exact_bwd) — pin it
    so a silent behavior change is caught."""
    x = jnp.zeros((2, 4, 4, 1), jnp.float32)  # all-tied windows
    g = jnp.ones((1, 2, 2, 1), jnp.float32)
    _, vjp = jax.vjp(lambda v: pool_max_folded(v, (2, 2, 2)), x)
    dx = np.asarray(vjp(g)[0])
    # every slot of every window gets the full 1.0 (8 tied slots/window)
    np.testing.assert_allclose(dx, np.ones_like(dx))


@pytest.mark.parametrize("sz", [2, 3])
def test_zd2s_forward_matches_reference(sz):
    x = jnp.asarray(_unique_rand((4, 6, 6, sz * 3), seed=50 + sz))
    got = zd2s(x, sz)
    want = _zd2s_ref(x, sz)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=0)


@pytest.mark.parametrize("sz", [2, 3])
def test_zd2s_vjp_matches_reference(sz):
    x = jnp.asarray(_unique_rand((4, 6, 6, sz * 2), seed=60 + sz))
    g = jnp.asarray(_unique_rand((4 * sz, 6, 6, 2), seed=70 + sz))
    _, vjp = jax.vjp(lambda v: zd2s(v, sz), x)
    _, vjp_ref = jax.vjp(lambda v: _zd2s_ref(v, sz), x)
    np.testing.assert_allclose(np.asarray(vjp(g)[0]),
                               np.asarray(vjp_ref(g)[0]), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("lead", [0, 1])
@pytest.mark.parametrize("win", [(2, 2, 2), (1, 2, 2)])
def test_max_pool_strided_matches_reference(lead, win):
    """BIAPY_TPU_POOL=strided path: fwd and grads vs the reshape reference,
    folded (lead=0) and batched (lead=1) layouts."""
    from biapy_tpu.models.blocks import _max_pool_strided

    shape = ((2,) if lead else ()) + (4, 8, 8, 3)
    x = jnp.asarray(_unique_rand(shape, seed=80 + lead + sum(win)))

    def ref(v):
        wz, wy, wx = win
        s = v.shape
        if lead:
            vr = v.reshape(s[0], s[1] // wz, wz, s[2] // wy, wy,
                           s[3] // wx, wx, s[4])
            return vr.max(axis=(2, 4, 6))
        return _pool_ref(v, win)

    got = _max_pool_strided(x, win)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref(x)),
                               rtol=0, atol=0)

    g = jnp.asarray(_unique_rand(got.shape, seed=90 + lead))
    _, vjp = jax.vjp(lambda v: _max_pool_strided(v, win), x)
    _, vjp_ref = jax.vjp(ref, x)
    np.testing.assert_allclose(np.asarray(vjp(g)[0]),
                               np.asarray(vjp_ref(g)[0]), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("folded,shape,w", [
    (True, (8, 8, 8, 3), (2, 2, 2)),
    (False, (2, 8, 8, 8, 3), (2, 2, 2)),
    (False, (2, 8, 8, 3), (2, 2)),
])
def test_max_pool_bwd_repeat4d_equivalent(monkeypatch, folded, shape, w):
    """BIAPY_TPU_POOL_BWD=repeat4d (the r5 default formulation of the
    eq-mask pool backward in the original rank) must be bit-equal to the
    6D reshape form (BIAPY_TPU_POOL_BWD=6d)."""
    from biapy_tpu.models.blocks import _max_pool_exact

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.permutation(np.prod(shape)).astype(np.float32)
                    .reshape(shape))
    monkeypatch.setenv("BIAPY_TPU_POOL_BWD", "6d")
    _, vjp = jax.vjp(lambda v: _max_pool_exact(v, w, folded), x)
    y = _max_pool_exact(x, w, folded)
    g = jnp.asarray(rng.standard_normal(y.shape).astype(np.float32))
    base = np.asarray(vjp(g)[0])
    monkeypatch.setenv("BIAPY_TPU_POOL_BWD", "repeat4d")
    _, vjp2 = jax.vjp(lambda v: _max_pool_exact(v, w, folded), x)
    np.testing.assert_array_equal(base, np.asarray(vjp2(g)[0]))

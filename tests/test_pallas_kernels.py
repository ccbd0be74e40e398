"""Pallas kernel checks.

The TPU interpreter on CPU executes kernel structure faithfully but its
hardware-PRNG emulation returns zero bits, so randomness-dependent assertions
(moments, skew, seed sensitivity) only run on real TPU backends — they are
exercised on-chip by scripts/drive_tpu.py and bench.py. Here: structural
invariants under interpret mode (shapes, start rows, zero-noise degenerate
dynamics) plus the TPU-gated statistical suite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from options_model_tpu.core.config import HestonParams
from options_model_tpu.ops.pallas_gbm import gbm_paths_pallas, gbm_terminal_pallas
from options_model_tpu.ops.pallas_heston import (
    heston_paths_pallas,
    heston_terminal_pallas,
)

HESTON = HestonParams(kappa=2.0, theta=0.04, xi=0.3, rho=-0.7, v0=0.04)
I = dict(interpret=True)

on_tpu = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="hardware PRNG only on TPU; interpreter emits zero bits",
)


class TestInterpretStructure:
    """Zero-noise interpreter runs: the dynamics degenerate to their
    deterministic skeletons, which have closed forms to pin."""

    def test_gbm_terminal_zero_noise_is_forward_drift(self):
        S = np.asarray(gbm_terminal_pallas(1, 100.0, 0.05, 0.2, 1.0, 8192, 16, **I))
        assert S.shape[0] >= 8192
        # z == 0 -> S_T = S0 exp((r - sigma^2/2) T)
        np.testing.assert_allclose(S, 100.0 * np.exp(0.05 - 0.02), rtol=1e-5)

    def test_gbm_paths_shape_and_start(self):
        S = np.asarray(gbm_paths_pallas(2, 100.0, 0.05, 0.2, 1.0, 4096, 12, **I))
        assert S.shape == (13, 4096)
        np.testing.assert_allclose(S[0], 100.0)
        assert np.isfinite(S).all() and (S > 0).all()

    def test_heston_terminal_zero_noise_matches_ode(self):
        # z == 0: v follows the deterministic mean reversion, logS integrates
        # (r - v/2) dt — reproduce with the same Euler recursion in NumPy.
        n_steps, T, r = 16, 1.0, 0.05
        S = np.asarray(heston_terminal_pallas(1, 100.0, r, T, HESTON,
                                              8192, n_steps, **I))
        dt = T / n_steps
        v, logS = HESTON.v0, 0.0
        for _ in range(n_steps):
            v_plus = max(v, 0.0)
            v = max(v_plus + HESTON.kappa * (HESTON.theta - v_plus) * dt, 0.0)
            logS += (r - 0.5 * v_plus) * dt
        np.testing.assert_allclose(S, 100.0 * np.exp(logS), rtol=1e-5)

    def test_heston_paths_shape(self):
        S = np.asarray(heston_paths_pallas(3, 100.0, 0.05, 1.0, HESTON,
                                           4096, 16, **I))
        assert S.shape == (17, 4096)
        np.testing.assert_allclose(S[0], 100.0)
        assert np.isfinite(S).all() and (S > 0).all()

    def test_rounds_up_paths(self):
        S = np.asarray(gbm_terminal_pallas(1, 100.0, 0.05, 0.2, 1.0, 5000, 4, **I))
        assert S.shape[0] >= 5000 and S.shape[0] % 128 == 0


@on_tpu
class TestOnChipStatistics:
    def test_gbm_terminal_moments(self):
        S = np.asarray(gbm_terminal_pallas(1, 100.0, 0.05, 0.2, 1.0, 1 << 17, 16))
        logret = np.log(S / 100.0)
        np.testing.assert_allclose(logret.mean(), 0.05 - 0.02, atol=0.01)
        np.testing.assert_allclose(logret.std(), 0.2, rtol=0.05)

    def test_heston_terminal_moments(self):
        S = np.asarray(heston_terminal_pallas(1, 100.0, 0.05, 1.0, HESTON,
                                              1 << 17, 64))
        np.testing.assert_allclose(S.mean(), 100.0 * np.exp(0.05), rtol=0.01)
        np.testing.assert_allclose(np.log(S / 100.0).std(), 0.2, rtol=0.1)

    def test_seed_determinism_and_sensitivity(self):
        a = np.asarray(gbm_terminal_pallas(9, 100.0, 0.05, 0.2, 1.0, 8192, 8))
        b = np.asarray(gbm_terminal_pallas(9, 100.0, 0.05, 0.2, 1.0, 8192, 8))
        c = np.asarray(gbm_terminal_pallas(10, 100.0, 0.05, 0.2, 1.0, 8192, 8))
        np.testing.assert_array_equal(a, b)
        assert not np.allclose(a, c)

    def test_negative_rho_skew(self):
        pn = HestonParams(kappa=2.0, theta=0.04, xi=0.8, rho=-0.9, v0=0.04)
        pp = HestonParams(kappa=2.0, theta=0.04, xi=0.8, rho=0.9, v0=0.04)
        Sn = np.asarray(heston_terminal_pallas(7, 100.0, 0.0, 1.0, pn, 1 << 16, 32))
        Sp = np.asarray(heston_terminal_pallas(7, 100.0, 0.0, 1.0, pp, 1 << 16, 32))
        from scipy.stats import skew
        assert skew(np.log(Sn / 100.0)) < skew(np.log(Sp / 100.0))


@on_tpu
class TestGlobalTileOffsets:
    """first_tile seeds by GLOBAL tile id: a call covering tiles [k, k+m)
    reproduces bitwise the tiles a full run produces there — the property
    path-sharded meshes rely on (parallel/batch.py, tests/
    test_pallas_sharding.py docstring)."""

    def test_gbm_terminal_chunk_equality(self):
        from options_model_tpu.ops.pallas_heston import TERMINAL_TILE
        full = np.asarray(gbm_terminal_pallas(3, 100.0, 0.05, 0.2, 1.0,
                                              2 * TERMINAL_TILE, 8))
        lo = np.asarray(gbm_terminal_pallas(3, 100.0, 0.05, 0.2, 1.0,
                                            TERMINAL_TILE, 8, first_tile=0))
        hi = np.asarray(gbm_terminal_pallas(3, 100.0, 0.05, 0.2, 1.0,
                                            TERMINAL_TILE, 8, first_tile=1))
        np.testing.assert_array_equal(full, np.concatenate([lo, hi]))
        assert not np.allclose(lo, hi)   # offset actually changes the stream

    def test_gbm_paths_chunk_equality(self):
        from options_model_tpu.ops.pallas_heston import PATH_TILE
        full = np.asarray(gbm_paths_pallas(5, 100.0, 0.05, 0.2, 1.0,
                                           2 * PATH_TILE, 6))
        lo = np.asarray(gbm_paths_pallas(5, 100.0, 0.05, 0.2, 1.0,
                                         PATH_TILE, 6, first_tile=0))
        hi = np.asarray(gbm_paths_pallas(5, 100.0, 0.05, 0.2, 1.0,
                                         PATH_TILE, 6, first_tile=1))
        np.testing.assert_array_equal(full, np.concatenate([lo, hi], axis=1))

    def test_heston_paths_chunk_equality(self):
        from options_model_tpu.ops.pallas_heston import PATH_TILE
        full = np.asarray(heston_paths_pallas(7, 100.0, 0.05, 1.0, HESTON,
                                              2 * PATH_TILE, 6))
        hi = np.asarray(heston_paths_pallas(7, 100.0, 0.05, 1.0, HESTON,
                                            PATH_TILE, 6, first_tile=1))
        np.testing.assert_array_equal(full[:, PATH_TILE:], hi)

    def test_qe_terminal_chunk_equality(self):
        from options_model_tpu.ops.pallas_heston import (
            TERMINAL_TILE, heston_terminal_qe_pallas)
        full = np.asarray(heston_terminal_qe_pallas(11, 100.0, 0.05, 1.0,
                                                    HESTON,
                                                    2 * TERMINAL_TILE, 8))
        hi = np.asarray(heston_terminal_qe_pallas(11, 100.0, 0.05, 1.0,
                                                  HESTON, TERMINAL_TILE, 8,
                                                  first_tile=1))
        np.testing.assert_array_equal(full[TERMINAL_TILE:], hi)

    def test_localvol_terminal_chunk_equality(self):
        from options_model_tpu.ops.pallas_heston import TERMINAL_TILE
        from options_model_tpu.ops.pallas_localvol import (
            localvol_terminal_pallas)
        from options_model_tpu.surface.cheb import compile_localvol_table
        table = compile_localvol_table(
            lambda m, t: 0.2 + 0.1 * m * m, K=100.0, T=1.0, n_steps=8,
            S0=100.0)
        full = np.asarray(localvol_terminal_pallas(13, 100.0, 0.05, 1.0,
                                                   table, 2 * TERMINAL_TILE,
                                                   8))
        hi = np.asarray(localvol_terminal_pallas(13, 100.0, 0.05, 1.0, table,
                                                 TERMINAL_TILE, 8,
                                                 first_tile=1))
        np.testing.assert_array_equal(full[TERMINAL_TILE:], hi)


class TestBlockedLayout:
    """layout="blocked" is a pure relabeling of the flat output: each kernel
    program's copy-out becomes one contiguous HBM slab (~1.8x throughput on
    v5e) while blocked.transpose(1,0,2,3).reshape == flat holds BITWISE (the
    per-date path order is unchanged). Interpret mode proves the plumbing on
    any backend; the TPU class below proves it on the real PRNG stream."""

    def test_layout_accessors_flat_vs_blocked(self):
        from options_model_tpu.ops.layout import (date_slice, initial_scalar,
                                                  num_paths, num_steps,
                                                  terminal_slice, to_flat)
        flat = heston_paths_pallas(3, 100.0, 0.05, 1.0, HESTON, 8192, 6, **I)
        blk = heston_paths_pallas(3, 100.0, 0.05, 1.0, HESTON, 8192, 6,
                                  layout="blocked", **I)
        assert blk.shape == (2, 7, 32, 128)
        assert num_steps(blk) == num_steps(flat) == 6
        assert num_paths(blk) == num_paths(flat) == 8192
        np.testing.assert_array_equal(np.asarray(flat), np.asarray(to_flat(blk)))
        for t in (0, 3, 6):
            np.testing.assert_array_equal(np.asarray(flat[t]),
                                          np.asarray(date_slice(blk, t)))
        np.testing.assert_array_equal(np.asarray(flat[-1]),
                                      np.asarray(terminal_slice(blk)))
        assert float(initial_scalar(blk)) == float(flat[0][0])

    def test_all_path_kernels_emit_blocked(self):
        from options_model_tpu.ops.layout import to_flat
        from options_model_tpu.ops.pallas_heston import heston_paths_qe_pallas
        Sf, Vf = heston_paths_pallas(5, 100.0, 0.05, 1.0, HESTON, 4096, 6,
                                     return_variance=True, **I)
        Sb, Vb = heston_paths_pallas(5, 100.0, 0.05, 1.0, HESTON, 4096, 6,
                                     return_variance=True, layout="blocked",
                                     **I)
        np.testing.assert_array_equal(np.asarray(Sf), np.asarray(to_flat(Sb)))
        np.testing.assert_array_equal(np.asarray(Vf), np.asarray(to_flat(Vb)))
        qf = heston_paths_qe_pallas(5, 100.0, 0.05, 1.0, HESTON, 4096, 6, **I)
        qb = heston_paths_qe_pallas(5, 100.0, 0.05, 1.0, HESTON, 4096, 6,
                                    layout="blocked", **I)
        np.testing.assert_array_equal(np.asarray(qf), np.asarray(to_flat(qb)))
        gf = gbm_paths_pallas(5, 100.0, 0.05, 0.2, 1.0, 4096, 6, **I)
        gb = gbm_paths_pallas(5, 100.0, 0.05, 0.2, 1.0, 4096, 6,
                              layout="blocked", **I)
        np.testing.assert_array_equal(np.asarray(gf), np.asarray(to_flat(gb)))

    def test_poly_backward_layout_invariant(self):
        """The American poly price is IDENTICAL through either layout (the
        backward pass sees the same per-date vectors element for element)."""
        from options_model_tpu.core.config import (LSMConfig, MCConfig,
                                                   OptionSpec, PUT)
        from options_model_tpu.pricers.american import (_pair_block,
                                                        lsm_poly_backward,
                                                        price_american_lsm,
                                                        simulate_paths)
        spec = OptionSpec(strike=100.0, rate=0.05, cp=PUT, sigma=0.2)
        mc = MCConfig(n_paths=8192, n_steps=6, path_block=4096)
        p_blk, _ = price_american_lsm(jax.random.key(0), 100.0, 0.5, spec, mc,
                                      LSMConfig(regressor="poly"),
                                      engine="pallas-interpret")
        k1, _ = jax.random.split(jax.random.key(0))
        Sp = simulate_paths(k1, 100.0, 0.5, mc, "gbm", sigma=0.2, rate=0.05,
                            engine="pallas-interpret", layout="flat")
        assert Sp.ndim == 2  # flat honored
        pb = _pair_block(mc, "gbm", "pallas-interpret")
        p_flat, _ = lsm_poly_backward(Sp, spec, 0.5, poly_degree=3,
                                      pair_block=pb, stat_pair_block=pb)
        assert float(p_blk) == float(p_flat)


@on_tpu
class TestBlockedLayoutOnChip:
    def test_blocked_equals_flat_bitwise(self):
        from options_model_tpu.ops.layout import to_flat
        from options_model_tpu.ops.pallas_heston import heston_paths_qe_pallas
        flat = np.asarray(heston_paths_pallas(7, 100.0, 0.05, 1.0, HESTON,
                                              1 << 14, 20))
        blk = heston_paths_pallas(7, 100.0, 0.05, 1.0, HESTON, 1 << 14, 20,
                                  layout="blocked")
        np.testing.assert_array_equal(flat, np.asarray(to_flat(blk)))
        qf = np.asarray(heston_paths_qe_pallas(7, 100.0, 0.05, 1.0, HESTON,
                                               1 << 14, 20))
        qb = heston_paths_qe_pallas(7, 100.0, 0.05, 1.0, HESTON, 1 << 14, 20,
                                    layout="blocked")
        np.testing.assert_array_equal(qf, np.asarray(to_flat(qb)))


class TestEngineSelection:
    def test_resolve(self):
        from options_model_tpu.ops.engine import is_pallas, resolve_engine

        assert resolve_engine("xla") == "xla"
        assert resolve_engine("pallas") == "pallas"
        assert resolve_engine("pallas-interpret") == "pallas-interpret"
        assert resolve_engine("auto") in ("xla", "pallas")
        assert is_pallas("pallas") and is_pallas("pallas-interpret")
        assert not is_pallas("xla")
        with pytest.raises(ValueError):
            resolve_engine("cuda")

    def test_seed_from_key_deterministic(self, key):
        from options_model_tpu.ops.engine import seed_from_key

        assert int(seed_from_key(key)) == int(seed_from_key(key))
        assert int(seed_from_key(key)) != int(seed_from_key(jax.random.key(1)))

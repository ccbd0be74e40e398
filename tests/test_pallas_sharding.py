"""Device-count invariance of the Pallas engines under path sharding.

The Pallas kernels seed their on-chip PRNG by GLOBAL tile id (first_tile +
local tile; ops/pallas_heston.py module note), so a mesh shard covering global
paths [first_tile*tile, ...) reproduces exactly the tiles an unsharded run
produces there. Two obstacles keep the real kernels out of this suite's CPU
mesh:

- the TPU interpreter's hardware-PRNG emulation returns zero bits (so streams
  cannot be distinguished), and
- interpret mode deadlocks under shard_map: the interpreter registers
  num_devices = prod(axis sizes) and synchronizes all of them on a
  threading.Barrier inside an io_callback, but the CPU client does not run
  all shard callbacks concurrently (verified: 2-device shard_map hangs at
  interpret_pallas_call._barrier).

So the invariance of the PLUMBING — _path_shard_geometry's tile alignment,
simulate_paths' pallas_global_tiles offset arithmetic, the shard bodies'
first_block wiring, pair-block statistics — is proven here against an XLA
"semantic twin" of the kernels (ops/xla_twins.py, shared with
__graft_entry__.dryrun_multichip so the driver record certifies the same
path): a stand-in with the exact calling convention and stream discipline
(tile t draws from fold_in(seed, first_tile + t), antithetic mirroring
within the tile) monkeypatched over the real kernel. The kernels' own
first_tile seeding is proven bitwise on real TPU hardware by the
chunk-equality tests in test_pallas_kernels.py (on_tpu) and exercised
end-to-end by scripts/drive_tpu.py and bench.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from options_model_tpu.core.config import PUT, MCConfig, OptionSpec
from options_model_tpu.ops.pallas_heston import PATH_TILE, TERMINAL_TILE
from options_model_tpu.parallel import (
    make_mesh,
    price_american_sharded_paths,
    price_european_sharded,
)
from options_model_tpu.parallel.batch import (
    _path_shard_geometry,
    price_american_bracket_sharded,
    price_american_grid_2d,
)
from options_model_tpu.pricers.american import (
    _pair_block,
    lsm_poly_backward,
    simulate_paths,
)

S0, K, T, R, SIG = 100.0, 100.0, 0.5, 0.05, 0.2
PUT_SPEC = OptionSpec(strike=K, rate=R, cp=PUT, sigma=SIG)


from options_model_tpu.ops.xla_twins import twin_gbm_paths, twin_gbm_terminal


@pytest.fixture
def twin_kernels(monkeypatch):
    """Route the Pallas dispatch to the XLA twins (simulate_paths and
    make_terminal_sampler import the kernels at call time, so patching the
    module attributes intercepts every resolution of engine='pallas')."""
    import options_model_tpu.ops.pallas_gbm as pg
    monkeypatch.setattr(pg, "gbm_paths_pallas", twin_gbm_paths)
    monkeypatch.setattr(pg, "gbm_terminal_pallas", twin_gbm_terminal)
    return pg


class TestGeometry:
    def test_xla_single_block_granularity(self):
        mc = MCConfig(n_paths=8 * 1024, path_block=1024)
        nb, per = _path_shard_geometry(mc, 8, "xla")
        assert (nb, per) == (8, 1)

    def test_pallas_rounds_to_tile_lcm(self):
        mc = MCConfig(n_paths=8 * 1024, path_block=1024)
        nb, per = _path_shard_geometry(mc, 8, "pallas")
        # lcm(4096, 1024) = 4096 paths = 4 blocks per device minimum
        assert per == 4 and nb == 32
        assert (per * mc.path_block) % PATH_TILE == 0

    def test_terminal_kernel_unit(self):
        mc = MCConfig(n_paths=8 * 16384, path_block=4096)
        nb, per = _path_shard_geometry(mc, 8, "pallas", kernel="terminal")
        assert (per * mc.path_block) % TERMINAL_TILE == 0
        assert nb * mc.path_block == 8 * 16384

    def test_pair_block_lcm(self):
        mc = MCConfig(n_paths=4096, path_block=1024)
        assert _pair_block(mc, "gbm", "pallas") == PATH_TILE
        assert _pair_block(mc, "gbm", "xla") == 1024


class TestShardedPathsPallasInvariance:
    """price_american_sharded_paths(engine='pallas') equals the unsharded
    twin pricing and is invariant to the device count."""

    @pytest.mark.slow
    def test_matches_unsharded_and_device_count(self, key, devices8,
                                                twin_kernels):
        cfg = MCConfig(n_paths=8 * 4096, n_steps=12, path_block=4096)
        results = {}
        for ndev in (8, 4, 2):
            mesh = make_mesh(("paths",), devices=devices8[:ndev])
            p, se = price_american_sharded_paths(key, S0, T, PUT_SPEC, cfg,
                                                 mesh, engine="pallas")
            results[ndev] = (float(p), float(se))

        S_paths = simulate_paths(key, S0, T, cfg, "gbm", sigma=SIG, rate=R,
                                 engine="pallas", pallas_global_tiles=True)
        pb = _pair_block(cfg, "gbm", "pallas")
        p_u, se_u = lsm_poly_backward(S_paths, PUT_SPEC, T,
                                      stat_pair_block=pb)
        for ndev, (p, se) in results.items():
            # exact up to the psum'ed Grams' float reduction order
            np.testing.assert_allclose(p, float(p_u), rtol=2e-5)
            np.testing.assert_allclose(se, float(se_u), rtol=1e-3)

    def test_price_sane_vs_crr(self, key, devices8, twin_kernels):
        from options_model_tpu.pricers import crr_american
        cfg = MCConfig(n_paths=8 * 4096, n_steps=50, path_block=4096)
        mesh = make_mesh(("paths",), devices=devices8)
        p, _ = price_american_sharded_paths(key, S0, T, PUT_SPEC, cfg, mesh,
                                            engine="pallas")
        oracle = crr_american(S0, K, T, R, SIG, cp=-1.0, n_steps=2048)
        assert abs(float(p) - oracle) / oracle < 0.02


class TestEuropeanShardedPallas:
    def test_matches_unsharded_and_device_count(self, key, devices8,
                                                twin_kernels):
        from options_model_tpu.pricers.european import (make_terminal_sampler,
                                                        price_european_mc)
        cfg = MCConfig(n_paths=8 * 16384, n_steps=8, path_block=4096)
        vals = []
        for ndev in (8, 2):
            mesh = make_mesh(("paths",), devices=devices8[:ndev])
            m, se, n = price_european_sharded(key, S0, T, PUT_SPEC, cfg, mesh,
                                              engine="pallas")
            vals.append((float(m), float(se), float(n)))
        sampler = make_terminal_sampler("gbm", S0, R, T, sigma=SIG,
                                        engine="pallas", global_tiles=True)
        m_u, se_u, n_u = price_european_mc(key, sampler, PUT_SPEC, T, cfg)
        for m, se, n in vals:
            np.testing.assert_allclose(m, float(m_u), rtol=1e-5)
            np.testing.assert_allclose(se, float(se_u), rtol=1e-4)
            assert n == float(n_u)

    def test_price_converges_to_bs(self, key, devices8, twin_kernels):
        from options_model_tpu.pricers import bs_price
        cfg = MCConfig(n_paths=8 * 16384, n_steps=8, path_block=4096)
        mesh = make_mesh(("paths",), devices=devices8)
        m, se, _ = price_european_sharded(key, S0, T, PUT_SPEC, cfg, mesh,
                                          engine="pallas")
        ref = float(bs_price(S0, K, T, R, SIG, PUT))
        assert abs(float(m) - ref) < 4 * float(se) + 1e-3


class TestGrid2DPallas:
    def test_mesh_factorization_invariance(self, key, devices8, twin_kernels):
        S0s = jnp.array([90.0, 100.0, 110.0, 100.0])
        Ks = jnp.full((4,), K)
        Ts = jnp.full((4,), T)
        # 8 blocks: every factorization pads to the same global block total,
        # so prices must agree exactly (same streams, same Grams up to psum
        # reduction order).
        cfg = MCConfig(n_paths=8 * 4096, n_steps=10, path_block=4096)
        out = {}
        for shape in ((1, 8), (2, 4), (4, 2)):
            mesh = make_mesh(("tasks", "paths"), shape=shape,
                             devices=devices8)
            out[shape] = np.asarray(price_american_grid_2d(
                key, S0s, Ks, Ts, R, cfg, mesh, sigma=SIG, engine="pallas"))
        np.testing.assert_allclose(out[(1, 8)], out[(2, 4)], rtol=2e-5)
        np.testing.assert_allclose(out[(1, 8)], out[(4, 2)], rtol=2e-5)


class TestBracketShardedPallas:
    def test_device_count_invariance(self, key, devices8, twin_kernels):
        cfg = MCConfig(n_paths=8 * 4096, n_steps=10, path_block=4096)
        brs = []
        for ndev in (8, 2):
            mesh = make_mesh(("paths",), devices=devices8[:ndev])
            brs.append(price_american_bracket_sharded(
                key, S0, T, PUT_SPEC, cfg, mesh, engine="pallas"))
        np.testing.assert_allclose(float(brs[0].low), float(brs[1].low),
                                   rtol=2e-5)
        np.testing.assert_allclose(float(brs[0].high), float(brs[1].high),
                                   rtol=2e-5)
        assert float(brs[0].low) <= float(brs[0].high) + 1e-3

    def test_oos_split_respects_kernel_pairs(self, key, devices8,
                                             twin_kernels):
        # path_block 1024 < tile 4096: the OOS parity must move to the
        # kernel-pair unit, or mirrored pairs straddle train/eval.
        cfg = MCConfig(n_paths=8 * 4096, n_steps=10, path_block=1024)
        mesh = make_mesh(("paths",), devices=devices8)
        br = price_american_bracket_sharded(key, S0, T, PUT_SPEC, cfg, mesh,
                                            engine="pallas")
        assert np.isfinite(float(br.low)) and np.isfinite(float(br.high))


class TestInterpretUnsharded:
    """The REAL kernels accept the global-tile arguments end to end (zero-bit
    interpreter PRNG: values are deterministic, so only plumbing/shape checks
    are meaningful here; the streams are pinned on TPU)."""

    def test_simulate_paths_global_tiles_interpret(self, key):
        cfg = MCConfig(n_paths=2 * 4096, n_steps=6, path_block=4096)
        full = simulate_paths(key, S0, T, cfg, "gbm", sigma=SIG, rate=R,
                              engine="pallas-interpret",
                              pallas_global_tiles=True)
        assert full.shape == (7, 8192)
        half = cfg.replace(n_paths=4096)
        lo = simulate_paths(key, S0, T, half, "gbm", sigma=SIG, rate=R,
                            engine="pallas-interpret",
                            pallas_global_tiles=True, first_block=0)
        hi = simulate_paths(key, S0, T, half, "gbm", sigma=SIG, rate=R,
                            engine="pallas-interpret",
                            pallas_global_tiles=True, first_block=1)
        np.testing.assert_allclose(np.asarray(full),
                                   np.concatenate([lo, hi], axis=1),
                                   rtol=1e-6)

    def test_heston_interpret_variance(self, key):
        from options_model_tpu.core.config import HestonParams
        hes = HestonParams(kappa=2.0, theta=0.04, xi=0.3, rho=-0.7, v0=0.04)
        cfg = MCConfig(n_paths=4096, n_steps=6, path_block=4096)
        S, v = simulate_paths(key, S0, T, cfg, "heston", rate=R, heston=hes,
                              engine="pallas-interpret",
                              pallas_global_tiles=True, return_variance=True)
        assert S.shape == v.shape == (7, 4096)

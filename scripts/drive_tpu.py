"""End-to-end drive of the public API on the real TPU chip.

The canonical verification run (see .claude/skills/verify/SKILL.md):

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/drive_tpu.py [--full]

Default covers the pricing core in ~5-10 min (first compiles dominate);
--full adds the calibration round trip, the IV-surface training path, and the
64x64 American surface (several extra minutes of remote compiles).
"""

import argparse
import time

import numpy as np


def log(msg):
    print(f"[drive] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from options_model_tpu.ops.engine import enable_compilation_cache
    enable_compilation_cache()
    log(f"devices: {jax.devices()}")
    t_start = time.time()

    from options_model_tpu.core.config import (
        CALL, PUT, HestonParams, LSMConfig, MCConfig, OptionSpec)
    from options_model_tpu.pricers import (
        bs_price, crr_american, price_american, price_barrier_mc,
        price_european_mc)
    from options_model_tpu.pricers.european import make_terminal_sampler

    key = jax.random.key(2026)
    S0, K, T, r, sig = 100.0, 100.0, 0.5, 0.05, 0.2
    put = OptionSpec(strike=K, rate=r, cp=PUT, sigma=sig)
    call = OptionSpec(strike=K, rate=r, cp=CALL, sigma=sig)
    hp = HestonParams(kappa=2.0, theta=0.04, xi=0.3, rho=-0.7, v0=0.04).validate()

    # 1. European MC through the fused Pallas terminal kernel vs BS.
    cfg = MCConfig(n_paths=262_144, n_steps=50)
    sampler = make_terminal_sampler("gbm", S0, r, T, sigma=sig)  # engine auto
    p, se, n = price_european_mc(key, sampler, call, T, cfg)
    bs = float(bs_price(S0, K, T, r, sig, 1.0))
    z = abs(float(p) - bs) / float(se)
    log(f"EU pallas: {float(p):.4f} +- {float(se):.4f} vs BS {bs:.4f} |z|={z:.2f}")
    assert z < 4

    # 2. American put LSM+CV (XLA engine) vs CRR — the 0.1% north star.
    mc = MCConfig(n_paths=500_000, n_steps=50)
    am, _ = price_american(key, S0, T, put, mc, LSMConfig(regressor="poly"),
                           engine="xla")
    oracle = crr_american(S0, K, T, r, sig, cp=-1.0, n_steps=4096)
    rel = abs(float(am) - oracle) / oracle
    log(f"AM xla: LSM+CV {float(am):.4f} vs CRR {oracle:.4f} rel {rel*100:.3f}%")
    assert rel < 0.001, f"American beyond 0.1%: {rel}"

    # 3. Same pricing through the Pallas full-path engine. Gate: z-test
    # against the BERMUDAN-adjusted oracle (the 50-date LSM prices a
    # Bermudan, -0.129% below continuous CRR — ROUND_NOTES "Accuracy
    # discipline"), plus a coarse absolute band. The old hard 0.2%-of-CRR
    # gate left only ~1.7 stderr of margin at 500k paths and tripped on an
    # ordinary draw (measured draws at 4 seeds: z in [-2.6, +0.4] vs the
    # Bermudan target).
    am_p, se_p = price_american(key, S0, T, put, mc,
                                LSMConfig(regressor="poly"), engine="pallas")
    rel_p = abs(float(am_p) - oracle) / oracle
    berm = oracle * (1.0 - 0.00129)
    z_p = (float(am_p) - berm) / float(se_p)
    log(f"AM pallas: {float(am_p):.4f} rel {rel_p*100:.3f}% "
        f"(z vs Bermudan {z_p:+.2f})")
    assert abs(z_p) < 4 and rel_p < 0.005

    # 3b. The SAME Pallas kernels through the path-sharded mesh entry
    # (parallel/batch.py engine='pallas', global-tile seeding). On the
    # single chip the 1-device mesh must reproduce an unsharded
    # global-tiles LSM run up to psum Gram reduction order — the per-chip
    # slice of the multi-chip path (VERDICT r3 next #1).
    from options_model_tpu.parallel import make_mesh
    from options_model_tpu.parallel.batch import price_american_sharded_paths
    from options_model_tpu.pricers.american import (_pair_block,
                                                    lsm_poly_backward,
                                                    simulate_paths)
    mc_s = MCConfig(n_paths=131_072, n_steps=50)
    mesh1 = make_mesh(("paths",), devices=jax.devices()[:1])
    p_sh, _ = price_american_sharded_paths(key, S0, T, put, mc_s, mesh1,
                                           engine="pallas")
    Sp = simulate_paths(key, S0, T, mc_s, "gbm", sigma=sig, rate=r,
                        engine="pallas", pallas_global_tiles=True)
    p_un, _ = lsm_poly_backward(Sp, put, T,
                                stat_pair_block=_pair_block(mc_s, "gbm",
                                                            "pallas"))
    rel_sh = abs(float(p_sh) - float(p_un)) / float(p_un)
    rel_sh_crr = abs(float(p_sh) - oracle) / oracle
    log(f"AM pallas sharded(1-dev mesh): {float(p_sh):.4f} vs unsharded "
        f"{float(p_un):.4f} rel {rel_sh*100:.4f}% (vs CRR "
        f"{rel_sh_crr*100:.3f}%)")
    assert rel_sh < 2e-3 and rel_sh_crr < 0.005

    # 4. Matrix-free replay LSM agrees with the stored-matrix price.
    from options_model_tpu.pricers.replay import price_american_lsm_gbm_replay
    mc_r = MCConfig(n_paths=131_072, n_steps=50)
    p_rep, _ = price_american_lsm_gbm_replay(key, S0, T, put, mc_r,
                                             stat_pair_block=mc_r.path_block)
    rel_r = abs(float(p_rep) - oracle) / oracle
    log(f"AM replay (O(paths) memory): {float(p_rep):.4f} rel {rel_r*100:.3f}%")
    assert rel_r < 0.01

    # 4b. Primal-dual bracket: the Rogers martingale-dual upper bound must
    # close within 1% of the CRR oracle and the bracket must contain it
    # (allowing the 50-date Bermudan-vs-continuous gap; pricers/dual.py).
    from options_model_tpu.pricers import price_american_bracket
    br = price_american_bracket(key, S0, T, put,
                                MCConfig(n_paths=131_072, n_steps=50),
                                engine="xla")
    log(f"AM bracket: [{float(br.low):.4f}, {float(br.high):.4f}] "
        f"(dual gap {float(br.high)/oracle-1:+.3%})")
    assert float(br.low) - 4 * float(br.low_stderr) <= oracle
    assert float(br.high) + 4 * float(br.high_stderr) >= oracle * 0.9985
    assert float(br.high) <= oracle * 1.01

    # 5. Heston: American via LSM (variance-augmented basis + COS control
    # variate) vs the ADI finite-difference oracle, + European COS check.
    from options_model_tpu.pricers.fd_heston import heston_fd_price
    amh, _ = price_american(key, S0, T, OptionSpec(strike=K, rate=r, cp=PUT,
                                                   sigma=None),
                            mc, LSMConfig(regressor="poly"),
                            model="heston", heston=hp)
    fd = heston_fd_price(S0, K, T, r, hp, cp=-1.0, american=True,
                         n_s=300, n_v=150, n_t=300)
    rel_h = abs(float(amh) - fd) / fd
    log(f"AM heston: LSM(S,v)+CV {float(amh):.4f} vs ADI FD {fd:.4f} "
        f"rel {rel_h*100:.3f}%")
    assert rel_h < 0.01, f"Heston American beyond 1% of the FD oracle: {rel_h}"
    # 5b. Heston primal-dual bracket: variance-basis policy + the
    # Euler-replicating inner sampler, anchored by the ADI oracle.
    br_h = price_american_bracket(key, S0, T,
                                  OptionSpec(strike=K, rate=r, cp=PUT,
                                             sigma=None),
                                  MCConfig(n_paths=131_072, n_steps=50),
                                  engine="xla", model="heston", heston=hp)
    log(f"AM heston bracket: [{float(br_h.low):.4f}, {float(br_h.high):.4f}] "
        f"(dual gap vs ADI {float(br_h.high)/fd-1:+.3%})")
    assert float(br_h.low) - 4 * float(br_h.low_stderr) <= fd
    assert float(br_h.high) + 4 * float(br_h.high_stderr) >= fd * 0.9985
    assert float(br_h.high) <= fd * 1.01

    from options_model_tpu.calibration import heston_cos_price
    cos = float(heston_cos_price(S0, K, T, r, hp, 1.0))
    cfg_h = MCConfig(n_paths=262_144, n_steps=100)
    sampler_h = make_terminal_sampler("heston", S0, r, T, heston=hp)
    ph_, seh, _ = price_european_mc(key, sampler_h, call, T, cfg_h)
    zz = abs(float(ph_) - cos) / max(float(seh), 1e-6)
    log(f"EU heston: pallas MC {float(ph_):.4f} vs COS {cos:.4f} |z|={zz:.2f}")
    assert zz < 5

    # 6. AD Greeks: European matches closed form; American delta sane.
    from options_model_tpu.pricers.blackscholes import bs_greeks
    from options_model_tpu.pricers.greeks import mc_greeks
    g_eu = mc_greeks(key, S0, T, call, MCConfig(n_paths=65_536, n_steps=25),
                     style="european")
    cf = bs_greeks(S0, K, T, r, sig, 1.0)
    dd = abs(float(g_eu["Delta"]) - float(cf["Delta"]))
    log(f"AD Greeks: EU delta {float(g_eu['Delta']):.4f} vs BS "
        f"{float(cf['Delta']):.4f} (diff {dd:.4f})")
    assert dd < 0.02
    g_am = mc_greeks(key, S0, T, put, MCConfig(n_paths=65_536, n_steps=25),
                     style="american")
    log(f"AD Greeks: AM put delta {float(g_am['Delta']):.4f} "
        f"vega {float(g_am['Vega']):.4f}")
    assert -1 < float(g_am["Delta"]) < 0 and float(g_am["Vega"]) > 0

    # 7. Barrier parity.
    mc_b = MCConfig(n_paths=131_072, n_steps=64)
    ko, _ = price_barrier_mc(key, S0, T, call, barrier=120.0,
                             barrier_type="up-and-out", mc=mc_b)
    ki, _ = price_barrier_mc(key, S0, T, call, barrier=120.0,
                             barrier_type="up-and-in", mc=mc_b)
    log(f"barrier: KO {float(ko):.4f} + KI {float(ki):.4f} (vanilla {bs:.4f})")
    assert abs(float(ko) + float(ki) - bs) < 0.15

    # 8. Local-vol curve sweep through the compiled-table grid path — the
    # CLI's --iv nn engine (fused Pallas local-vol kernel on TPU). A constant
    # surface makes the table exact: prices must match the GBM CRR oracle.
    from options_model_tpu.apps.curves import CurveRequest, compute_curves
    df_lv = compute_curves(CurveRequest(
        s0_list=[95.0, 100.0, 105.0], strike=K, rate=r, cp=PUT,
        intervals_per_day=1, total_points=2, num_simulations=65_536,
        model="localvol",
        sigma_fn=lambda S, tau: jnp.full_like(jnp.asarray(S), sig),
        use_control_variate=False))
    d_far = df_lv["Days to Expiry"].max()
    row = df_lv[(df_lv["S0"] == 100.0) & (df_lv["Days to Expiry"] == d_far)]
    lv_oracle = crr_american(100.0, K, d_far / 365.0, r, sig, cp=-1.0,
                             n_steps=2048)
    lv_err = abs(float(row["Option Value"].iloc[0]) - lv_oracle)
    log(f"local-vol grid (Pallas table kernel): {float(row['Option Value'].iloc[0]):.4f} "
        f"vs CRR {lv_oracle:.4f} (|diff| {lv_err:.4f})")
    assert lv_err < max(6.0 * float(row["StdErr"].iloc[0]), 0.05)

    # 8b. Shared-path homogeneity sweep (the default GBM/Heston curve
    # engine): one simulation per curve point serves the whole S0 grid;
    # every spot must match its own CRR oracle.
    df_sh = compute_curves(CurveRequest(
        s0_list=[90.0, 100.0, 110.0], strike=K, rate=r, cp=PUT,
        intervals_per_day=1, total_points=2, num_simulations=262_144,
        sigma=sig))
    d_far2 = df_sh["Days to Expiry"].max()
    for s0 in (90.0, 100.0, 110.0):
        row2 = df_sh[(df_sh["S0"] == s0)
                     & (df_sh["Days to Expiry"] == d_far2)]
        crr2 = crr_american(s0, K, d_far2 / 365.0, r, sig, cp=-1.0,
                            n_steps=2048)
        err2 = abs(float(row2["Option Value"].iloc[0]) - crr2)
        assert err2 < max(6.0 * float(row2["StdErr"].iloc[0]), 0.03), (
            s0, float(row2["Option Value"].iloc[0]), crr2)
    log("shared-path sweep: 3 spots vs CRR ok (far point, 262k paths)")

    # 8c. Multilevel MC: the coupled Heston hierarchy must land on the COS
    # closed form within its own eps contract (bias + variance halves).
    from options_model_tpu.pricers.mlmc import price_mlmc
    res_ml = price_mlmc(key, S0, K, r, T, cp=1.0, payoff="european",
                        model="heston", heston=hp, eps=3e-2, n0=4,
                        L_min=2, L_max=5, n_pilot=4096)
    cos_ml = float(heston_cos_price(S0, K, T, r, hp, cp=1.0))
    err_ml = abs(res_ml.price - cos_ml)
    log(f"MLMC heston EU: {res_ml.price:.4f} vs COS {cos_ml:.4f} "
        f"(se {res_ml.stderr:.4f}, bias<={res_ml.bias_bound:.4f}, "
        f"levels {res_ml.levels}, beta {res_ml.beta:.2f})")
    assert err_ml < 4 * res_ml.stderr + max(res_ml.bias_bound, 3e-2)

    # 8d. SABR: European MC (frozen-vol CV) on the chip vs the Hagan closed
    # form, within MC error + the formula's own O(nu^2 T) approximation.
    from options_model_tpu.core.config import SABRParams
    from options_model_tpu.models.sabr import sabr_bs_price, sabr_european_mc
    sabr = SABRParams(alpha=0.2, beta=1.0, rho=-0.4, nu=0.6).validate()
    mc_s = MCConfig(n_paths=262_144, n_steps=64)
    S0_fwd = S0 * float(jnp.exp(-r * T))   # so F0 = S0
    p_sabr, se_sabr = sabr_european_mc(key, S0_fwd, K, r, T, sabr, mc_s,
                                       cp=1.0)
    hagan = float(sabr_bs_price(S0, K, T, r, sabr, 1.0))
    log(f"SABR EU: mc {float(p_sabr):.4f} +- {float(se_sabr):.4f} vs "
        f"Hagan {hagan:.4f}")
    assert abs(float(p_sabr) - hagan) < 4 * float(se_sabr) + 3e-3 * hagan

    # 8d-ii. SABR American through the flagship dispatcher: forward
    # simulation + spot conversion + (S, alpha) basis + Richardson, anchored
    # by the (F, alpha) Douglas-ADI oracle (pricers/fd_sabr.py; measured MC
    # gap ~0.3-0.5% low at these sizes — policy suboptimality + grid error).
    from options_model_tpu.pricers.fd_sabr import sabr_fd_price
    p_sam, se_sam = price_american(
        key, S0, T, OptionSpec(strike=K, rate=r, cp=PUT, sigma=None),
        MCConfig(n_paths=131_072, n_steps=50),
        LSMConfig(regressor="poly", richardson=True), model="sabr",
        sabr=sabr)
    fd_s = sabr_fd_price(S0, K, T, r, sabr, cp=-1.0, n_f=450, n_a=180,
                         n_t=450)
    rel_sam = abs(float(p_sam) - fd_s) / fd_s
    log(f"SABR AM put: LSM(S,a)+Richardson {float(p_sam):.4f} +- "
        f"{float(se_sam):.4f} vs ADI {fd_s:.4f} rel {rel_sam*100:.3f}%")
    assert rel_sam < 0.015

    # 8d2. Rough Bergomi on-chip: the hybrid scheme (Volterra convolution on
    # the MXU) vs the host-side exact-covariance Cholesky oracle at the SAME
    # grid, plus the American (S, v) ordering above the European.
    from options_model_tpu.core.config import RBergomiParams
    from options_model_tpu.models.rbergomi import (rbergomi_european_mc,
                                                   rbergomi_exact_chol)
    rbp = RBergomiParams(H=0.1, eta=1.5, rho=-0.7, xi0=0.04).validate()
    mc_rb = MCConfig(n_paths=65_536, n_steps=50)
    p_rb, se_rb = rbergomi_european_mc(key, S0, K, r, T, rbp, mc_rb, cp=-1.0)
    p_rc, se_rc, _ = rbergomi_exact_chol(7, S0, K, r, T, rbp, n_steps=50,
                                         n_paths=32_768, cp=-1.0)
    z_rb = (float(p_rb) - p_rc) / float(np.hypot(float(se_rb), se_rc))
    log(f"rBergomi EU (H=0.1): hybrid {float(p_rb):.4f} +- "
        f"{float(se_rb):.4f} vs Cholesky-exact {p_rc:.4f} |z|={abs(z_rb):.2f}")
    assert abs(z_rb) < 4.0
    p_ram, se_ram = price_american(
        key, S0, T, OptionSpec(strike=K, rate=r, cp=PUT, sigma=None),
        MCConfig(n_paths=65_536, n_steps=50), LSMConfig(regressor="poly"),
        model="rbergomi", rbergomi=rbp)
    log(f"rBergomi AM put: LSM(S,v) {float(p_ram):.4f} +- "
        f"{float(se_ram):.4f} (EU floor {float(p_rb):.4f})")
    assert float(p_ram) >= float(p_rb) - 4 * (float(se_ram) + float(se_rb))

    # 8e. Variance Gamma: exact-terminal European MC vs the COS closed form,
    # and the American LSM+CV sits above the European floor.
    from options_model_tpu.core.config import VGParams
    from options_model_tpu.calibration.charfn import vg_cos_price
    from options_model_tpu.pricers.european import (make_terminal_sampler,
                                                    price_european_mc)
    vgp = VGParams(sigma=0.18, theta=-0.14, nu=0.35).validate()
    mc_vg = MCConfig(n_paths=262_144, n_steps=1)
    samp_vg = make_terminal_sampler("vg", S0, r, T, vg=vgp)
    p_vg, se_vg, _ = price_european_mc(key, samp_vg,
                                       OptionSpec(strike=K, rate=r, cp=1.0),
                                       T, mc_vg)
    cos_vg = float(vg_cos_price(S0, K, T, r, vgp, cp=1.0, n_terms=4096))
    log(f"VG EU: exact-terminal mc {float(p_vg):.4f} +- {float(se_vg):.4f} "
        f"vs COS {cos_vg:.4f}")
    assert abs(float(p_vg) - cos_vg) < 4 * float(se_vg)
    from options_model_tpu.pricers.american import (
        price_american_with_control_variate)
    spec_vg = OptionSpec(strike=K, rate=r, cp=-1.0)
    am_vg, am_se_vg = price_american_with_control_variate(
        key, S0, T, spec_vg, MCConfig(n_paths=131_072, n_steps=50),
        LSMConfig(), model="vg", vg=vgp)
    eu_put_vg = float(vg_cos_price(S0, K, T, r, vgp, cp=-1.0, n_terms=4096))
    log(f"VG AM put: LSM+CV {float(am_vg):.4f} +- {float(am_se_vg):.4f} "
        f"(EU floor {eu_put_vg:.4f})")
    assert float(am_vg) > eu_put_vg - 2 * float(am_se_vg)

    # 8f. Jump-family American anchors: the Fang-Oosterlee Bermudan-COS
    # oracle (pricers/cos_bermudan.py) prices the SAME 50-date contract the
    # LSM discretizes — the first external check on American prices under
    # Merton and VG (the Levy analogue of the Heston ADI gate in leg 5).
    from options_model_tpu.core.config import MertonParams
    from options_model_tpu.pricers.cos_bermudan import cos_bermudan_price
    berm_vg = cos_bermudan_price(S0, K, T, r, "vg", vg=vgp, cp=-1.0,
                                 n_dates=50)
    rel_vg = abs(float(am_vg) - berm_vg) / berm_vg
    log(f"VG AM vs Bermudan-COS oracle {berm_vg:.4f}: rel {rel_vg*100:.3f}%")
    assert rel_vg < 0.01 or abs(float(am_vg) - berm_vg) < 4 * float(am_se_vg)
    mp_d = MertonParams(sigma=0.2, lam=1.0, mu_j=-0.10, sigma_j=0.15)
    am_mj, se_mj = price_american_with_control_variate(
        key, S0, T, OptionSpec(strike=K, rate=r, cp=-1.0, sigma=0.2),
        MCConfig(n_paths=131_072, n_steps=50), LSMConfig(), model="merton",
        merton=mp_d)
    berm_mj = cos_bermudan_price(S0, K, T, r, "merton", merton=mp_d, cp=-1.0,
                                 n_dates=50)
    rel_mj = abs(float(am_mj) - berm_mj) / berm_mj
    log(f"Merton AM put: LSM+CV {float(am_mj):.4f} vs Bermudan-COS "
        f"{berm_mj:.4f} rel {rel_mj*100:.3f}%")
    assert rel_mj < 0.01 or abs(float(am_mj) - berm_mj) < 4 * float(se_mj)

    # 9. Validation errors raise cleanly.
    for bad in (lambda: OptionSpec(strike=-5.0, rate=r).validate(),
                lambda: HestonParams(kappa=2.0, theta=0.04, xi=0.3, rho=-2.0,
                                     v0=0.04).validate(),
                lambda: MCConfig(path_block=100).validate(),
                lambda: LSMConfig(poly_degree=0).validate()):
        try:
            bad()
            raise AssertionError("validation did not raise")
        except ValueError as e:
            log(f"probe ValueError ok: {str(e)[:50]}")

    if args.full:
        # 9. Calibration round trip on synthetic COS surface.
        from options_model_tpu.core.config import CalibrationConfig
        from options_model_tpu.calibration import (
            calibrate_heston_to_data, create_synthetic_heston_surface)
        true = HestonParams(kappa=2.5, theta=0.04, xi=0.3, rho=-0.7, v0=0.04)
        Ks, Ts, ivs = create_synthetic_heston_surface(true)
        params, summary = calibrate_heston_to_data(
            Ks, Ts, ivs, S0=100.0,
            config=CalibrationConfig(optimization_methods=("L-BFGS-B",)))
        log(f"calibration: fit {params} err {summary['error']:.5f}")
        assert summary["error"] < 0.01

        # 10. IV-surface training + local-vol pricing.
        from options_model_tpu.core.config import SurfaceTrainConfig
        from options_model_tpu.data.synthetic import synthetic_smile_surface
        from options_model_tpu.surface.model import IVSurfaceModel
        Ko, To, ivo, S0o = synthetic_smile_surface()
        model = IVSurfaceModel.fit(Ko, To, ivo, S0o, SurfaceTrainConfig(
            hidden_dim=32, num_hidden_layers=2, epochs=300, dropout=0.05,
            use_vega_weighting=False, patience=300))
        rmse = float(np.sqrt(np.mean((model.predict(Ko, To) - ivo) ** 2)))
        log(f"surface NN: RMSE {rmse:.4f}")
        assert rmse < 0.05
        lv, _ = price_american(key, S0, 0.25, OptionSpec(strike=K, rate=r,
                                                         cp=PUT, sigma=None),
                               MCConfig(n_paths=16_384, n_steps=25),
                               LSMConfig(regressor="poly",
                                         use_control_variate=False),
                               model="localvol", sigma_fn=model.sigma_fn(K))
        log(f"local-vol AM put: {float(lv):.4f}")

        # 11. 64x64 American Heston surface.
        from options_model_tpu.pricers.surface_american import (
            price_american_surface)
        Kg = jnp.linspace(70.0, 130.0, 64)
        Tg = jnp.linspace(0.1, 1.0, 64)
        P = np.asarray(price_american_surface(
            key, S0, Kg, Tg, r, MCConfig(n_paths=16_384, n_steps=50),
            cp=-1.0, heston=hp))
        t0 = time.time()
        P = np.asarray(price_american_surface(
            jax.random.key(1), S0, Kg, Tg, r,
            MCConfig(n_paths=16_384, n_steps=50), cp=-1.0, heston=hp))
        log(f"64x64 surface: {time.time()-t0:.1f}s warm, "
            f"monotone-K {bool(np.all(np.diff(P, 1) > -1e-3))}")

        # 12. rBergomi calibration round trip (no char-fn: jitted CRN MC
        # objective, calibration/rbergomi.py) + the rBergomi RQMC pricer.
        from options_model_tpu.calibration import (
            calibrate_rbergomi_to_data, create_synthetic_rbergomi_surface)
        from options_model_tpu.core.config import RBergomiParams
        rb_true = RBergomiParams(H=0.1, eta=1.5, rho=-0.7, xi0=0.04)
        K_rb, T_rb, iv_rb = create_synthetic_rbergomi_surface(rb_true)
        rb_fit, rb_summ = calibrate_rbergomi_to_data(
            K_rb, T_rb, iv_rb, 100.0, 0.05, rho=-0.7)
        log(f"rBergomi calibration: H {rb_fit.H:.4f} eta {rb_fit.eta:.3f} "
            f"xi0 {rb_fit.xi0:.4f} (true 0.1/1.5/0.04) "
            f"rmse {rb_summ['error']:.5f}")
        assert abs(rb_fit.H - 0.1) < 0.08 and abs(rb_fit.xi0 - 0.04) < 0.01
        from options_model_tpu.pricers.qmc import price_european_qmc
        p_rq, se_rq, _ = price_european_qmc(
            17, "rbergomi", 100.0, OptionSpec(strike=K, rate=r, cp=PUT,
                                              sigma=None),
            0.5, rbergomi=rb_true, n_paths=1 << 13, n_steps=64,
            replicates=8)
        log(f"rBergomi RQMC EU put: {float(p_rq):.4f} +- {float(se_rq):.5f}")
        assert float(se_rq) < 0.02

    log(f"ALL DRIVES OK in {time.time()-t_start:.0f}s")


if __name__ == "__main__":
    main()

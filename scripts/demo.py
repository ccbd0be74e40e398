"""Narrated end-to-end feature demo (the reference's demo_improvements.py
analogue): walks every major subsystem with small workloads and prints what it
finds. Safe offline — synthetic data only.

    python scripts/demo.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax

    from options_model_tpu.core.config import (
        CALL, PUT, CalibrationConfig, HestonParams, LSMConfig, MCConfig,
        OptionSpec, SurfaceTrainConfig)

    key = jax.random.key(2026)
    print(f"Backend: {jax.default_backend()}  devices: {jax.devices()}")

    print("\n[1] Black-Scholes closed form + autodiff Greeks")
    from options_model_tpu.pricers import bs_greeks, bs_price
    p = float(bs_price(100.0, 100.0, 0.5, 0.05, 0.2, 1.0))
    g = {k: round(float(v), 4) for k, v in
         bs_greeks(100.0, 100.0, 0.5, 0.05, 0.2, 1.0).items()}
    print(f"    ATM call: {p:.4f}   Greeks: {g}")

    print("\n[2] European MC (streaming Welford) vs closed form")
    from options_model_tpu.pricers import price_european_mc
    from options_model_tpu.pricers.european import make_terminal_sampler
    cfg = MCConfig(n_paths=2**16, n_steps=16, path_block=4096)
    spec = OptionSpec(strike=100.0, rate=0.05, cp=CALL, sigma=0.2)
    sampler = make_terminal_sampler("gbm", 100.0, 0.05, 0.5, sigma=0.2)
    mc_p, se, n = price_european_mc(key, sampler, spec, 0.5, cfg)
    print(f"    MC {float(mc_p):.4f} +- {float(se):.4f} (n={int(n)}) vs BS {p:.4f}")

    print("\n[3] American put LSM + control variate vs CRR binomial")
    from options_model_tpu.pricers import crr_american, price_american
    pspec = OptionSpec(strike=100.0, rate=0.05, cp=PUT, sigma=0.2)
    am, _ = price_american(key, 100.0, 0.5, pspec,
                           MCConfig(n_paths=2**15, n_steps=50, path_block=4096),
                           LSMConfig(regressor="poly"))
    crr = crr_american(100.0, 100.0, 0.5, 0.05, 0.2, cp=-1.0)
    print(f"    LSM+CV {float(am):.4f} vs CRR {crr:.4f} "
          f"(rel {abs(float(am)-crr)/crr*100:.2f}%)")

    print("\n[4] Heston: fused simulation + COS closed-form pricing")
    from options_model_tpu.calibration import heston_cos_price
    hp = HestonParams(kappa=2.0, theta=0.04, xi=0.5, rho=-0.7, v0=0.04)
    Ks = np.array([90.0, 100.0, 110.0])
    cos = np.asarray(heston_cos_price(100.0, Ks, 0.5, 0.05, hp, 1.0))
    print(f"    COS call prices at K={Ks.tolist()}: {np.round(cos, 4).tolist()}")

    print("\n[5] Heston calibration round trip (synthetic surface, known truth)")
    from options_model_tpu.calibration import (
        calibrate_heston_to_data, create_synthetic_heston_surface)
    true = HestonParams(kappa=2.5, theta=0.04, xi=0.3, rho=-0.7, v0=0.04)
    K, T, iv = create_synthetic_heston_surface(true)
    params, summary = calibrate_heston_to_data(
        K, T, iv, S0=100.0,
        config=CalibrationConfig(optimization_methods=("L-BFGS-B",)))
    print(f"    true: {true}")
    print(f"    fit : {params}  (weighted IV RMSE {summary['error']:.5f})")

    print("\n[6] IV-surface network on the synthetic smile + local-vol pricing")
    from options_model_tpu.data.synthetic import synthetic_smile_surface
    from options_model_tpu.surface.model import IVSurfaceModel
    Ko, To, ivo, S0o = synthetic_smile_surface()
    model = IVSurfaceModel.fit(Ko, To, ivo, S0o, SurfaceTrainConfig(
        hidden_dim=32, num_hidden_layers=2, epochs=300, dropout=0.05,
        use_vega_weighting=False, patience=300))
    pred = model.predict(Ko, To)
    print(f"    fit RMSE {np.sqrt(np.mean((pred-ivo)**2)):.4f}; "
          f"sigma(K=100, 30d) = {model.get_sigma_iv(100.0, 100.0, 30/365):.2%}")
    lv, _ = price_american(key, 100.0, 0.25, OptionSpec(strike=100.0, rate=0.05,
                                                        cp=PUT, sigma=None),
                           MCConfig(n_paths=2**14, n_steps=25, path_block=4096),
                           LSMConfig(regressor="poly", use_control_variate=False),
                           model="localvol", sigma_fn=model.sigma_fn(100.0))
    print(f"    American put under the learned local-vol surface: {float(lv):.4f}")

    print("\n[7] Barrier option (implements the reference's stub for real)")
    from options_model_tpu.pricers import price_barrier_mc
    ko, _ = price_barrier_mc(key, 100.0, 0.5, spec, barrier=120.0,
                             barrier_type="up-and-out",
                             mc=MCConfig(n_paths=2**15, n_steps=64, path_block=4096))
    print(f"    up-and-out 120 call: {float(ko):.4f} (vanilla {p:.4f})")

    print("\n[8] Sharded batch pricing on the device mesh")
    from options_model_tpu.parallel import make_mesh, price_american_grid
    mesh = make_mesh(("tasks",))
    S0s = np.linspace(90.0, 110.0, 8)
    prices = price_american_grid(key, S0s, np.full(8, 100.0), np.full(8, 0.5),
                                 0.05, MCConfig(n_paths=8192, n_steps=25,
                                                path_block=4096),
                                 mesh, cp=PUT, sigma=0.2)
    print(f"    {mesh.devices.size}-device mesh, 8-task put grid: "
          f"{np.round(np.asarray(prices), 3).tolist()}")

    print("\n[9] Dividend yield q end-to-end (r2)")
    q = 0.08
    cq = float(bs_price(100.0, 100.0, 1.0, 0.05, 0.25, 1.0, q=q))
    amq, _ = price_american(key, 100.0, 1.0,
                            OptionSpec(strike=100.0, rate=0.05, cp=CALL,
                                       sigma=0.25, div_yield=q),
                            MCConfig(n_paths=2**15, n_steps=50,
                                     path_block=4096),
                            LSMConfig(regressor="poly"))
    crrq = crr_american(100.0, 100.0, 1.0, 0.05, 0.25, cp=1.0, q=q)
    print(f"    q={q:.0%} call: European {cq:.4f} < American {float(amq):.4f} "
          f"(early-exercise premium; CRR oracle {crrq:.4f})")

    print("\n[10] Spot-homogeneity curve sweep (one simulation per point, r2)")
    from options_model_tpu.apps.curves import CurveRequest, compute_curves
    df = compute_curves(CurveRequest(
        s0_list=[95.0, 100.0, 105.0], strike=100.0, rate=0.05, cp=PUT,
        intervals_per_day=1, total_points=2, num_simulations=2**15,
        sigma=0.2, seed=7))
    far = df[df["Days to Expiry"] == df["Days to Expiry"].max()]
    print(f"    3-spot curve (shared paths): "
          f"{np.round(far['Option Value'].values, 4).tolist()}")

    print("\n[11] Calibrate -> price the American surface (r2 pipeline)")
    from options_model_tpu.pricers import price_american_surface
    import jax.numpy as jnp
    P = np.asarray(price_american_surface(
        key, 100.0, jnp.linspace(80.0, 120.0, 4), jnp.linspace(0.25, 1.0, 2),
        0.05, MCConfig(n_paths=2**14, n_steps=25, path_block=4096),
        cp=PUT, heston=params))
    print(f"    4x2 put surface under the FITTED params:\n"
          f"    {np.round(P, 3).tolist()}")

    print("\nDemo complete.")


if __name__ == "__main__":
    main()

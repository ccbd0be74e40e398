"""Heston calibration CLI (reference heston_calibration.py:836-861).

    python -m options_model_tpu.apps.calibrate --test --diagnostics-dir out/
    python -m options_model_tpu.apps.calibrate --ticker AAPL --verbose

``--test`` calibrates against the synthetic Heston surface oracle with known
true parameters (create_synthetic_heston_data, heston_calibration.py:730-774)
and reports recovery error — no network needed. ``--diagnostics-dir`` emits
the 2x2 calibration diagnostics figure the reference auto-plots
(heston_calibration.py:582-594,597-709).
"""

from __future__ import annotations

import argparse
import sys

from options_model_tpu.core.config import CalibrationConfig, HestonParams
from options_model_tpu.utils.logging import get_logger

log = get_logger(__name__)


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Heston model calibration (COS + "
                                            "gradient cascade)")
    p.add_argument("--ticker", type=str, default="AAPL",
                   help="Stock ticker to fetch the option chain for")
    p.add_argument("--model", type=str, default="heston",
                   choices=["heston", "bates", "vg", "rbergomi"],
                   help="bates adds the lognormal jump triple (lam, mu_j, "
                        "sigma_j) to the fit — beyond-reference; include "
                        "short-dated expiries, jumps are identified there. "
                        "vg fits the 3-param Variance Gamma pure-jump Levy "
                        "family (sigma, theta, nu). rbergomi fits "
                        "(xi0, eta, H) at fixed --rho by variance level + "
                        "ATM-skew term structure + CRN MC polish "
                        "(calibration/rbergomi.py) — no char-fn exists for "
                        "H<1/2, so the objective prices by hybrid-scheme MC")
    p.add_argument("--rho", type=float, default=-0.7,
                   help="rbergomi only: spot-vol correlation, held fixed "
                        "(on one surface rho and eta enter the skew only "
                        "through their product)")
    p.add_argument("--polish-evals", type=int, default=160,
                   help="rbergomi only: Nelder-Mead evaluation budget for "
                        "the CRN full-surface polish")
    p.add_argument("--test", action="store_true",
                   help="Calibrate against the synthetic Heston oracle "
                        "(no network)")
    p.add_argument("--rate", type=float, default=0.05)
    p.add_argument("--div-yield", type=float, default=0.0,
                   help="Continuous dividend yield q of the underlying")
    p.add_argument("--noise", type=float, default=0.0,
                   help="IV noise stddev added to the synthetic surface")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--max-iterations", type=int, default=2000)
    p.add_argument("--methods", type=str, nargs="+",
                   default=["L-BFGS-B", "differential_evolution",
                            "dual_annealing"])
    p.add_argument("--no-vega-weighting", action="store_true")
    p.add_argument("--diagnostics-dir", type=str, default=None,
                   help="Write the 2x2 calibration diagnostics PNG here")
    p.add_argument("--price-surface", type=str, default=None, metavar="CSV",
                   help="After calibrating, price a 64x64 American surface "
                        "under the fitted parameters and write it here "
                        "(shared-path LSM, pricers/surface_american.py)")
    p.add_argument("--surface-size", type=int, nargs=2, default=(64, 64),
                   metavar=("NT", "NK"))
    p.add_argument("--verbose", action="store_true")
    return p.parse_args(argv)


def _run_rbergomi(args) -> dict:
    """rBergomi branch: no characteristic function exists for H<1/2, so the
    fit rides the MC machinery (calibration/rbergomi.py) rather than the
    COS cascade the other families share."""
    import numpy as np

    from options_model_tpu.calibration.rbergomi import (
        calibrate_rbergomi_to_data, create_synthetic_rbergomi_surface)
    from options_model_tpu.core.config import RBergomiParams

    if args.test:
        true = RBergomiParams(H=0.1, eta=1.5, rho=args.rho, xi0=0.04)
        K, T, iv = create_synthetic_rbergomi_surface(
            true, S0=100.0, rate=args.rate, noise_std=args.noise,
            seed=args.seed)
        S0 = 100.0
        log.info(f"Synthetic rBergomi calibration test: true {true}")
    else:
        from options_model_tpu.data.market import fetch_option_chain
        Kq, Tq, ivq, S0 = fetch_option_chain(args.ticker)
        # the fitter wants a rectangular (expiry, strike) grid: bucket the
        # chain by expiry and interpolate each slice onto common moneyness
        Tu = np.unique(np.round(np.asarray(Tq), 6))
        mny = np.linspace(0.85, 1.15, 7)
        K = mny * S0
        iv = np.zeros((len(Tu), len(K)))
        for i, t in enumerate(Tu):
            m = np.isclose(np.asarray(Tq), t)
            order = np.argsort(np.asarray(Kq)[m])
            iv[i] = np.interp(K, np.asarray(Kq)[m][order],
                              np.asarray(ivq)[m][order])
        T = Tu
        log.info(f"Calibrating rBergomi to {iv.size} gridded {args.ticker} "
                 f"quotes, S0={S0:.2f}")
    params, summary = calibrate_rbergomi_to_data(
        K, T, iv, S0, args.rate, rho=args.rho, seed=args.seed,
        max_polish_evals=args.polish_evals)
    summary["params"] = params
    if args.test:
        summary["true_params"] = true
        summary["param_errors"] = {
            "H": abs(params.H - true.H), "eta": abs(params.eta - true.eta),
            "xi0": abs(params.xi0 - true.xi0)}
    return summary


def run(args) -> dict:
    from options_model_tpu.calibration.calibrator import (
        calibrate_bates_to_data, calibrate_heston_to_data,
        calibrate_vg_to_data)

    if args.model == "rbergomi":
        if args.price_surface:
            raise SystemExit("--price-surface supports heston/bates (the "
                             "shared-path surface backward rides the (S, v) "
                             "variance state)")
        return _run_rbergomi(args)

    cfg = CalibrationConfig(
        use_vega_weighting=not args.no_vega_weighting,
        max_iterations=args.max_iterations,
        optimization_methods=tuple(args.methods),
        seed=args.seed, verbose=args.verbose).validate()
    calibrate_fn = (calibrate_bates_to_data if args.model == "bates"
                    else calibrate_vg_to_data if args.model == "vg"
                    else calibrate_heston_to_data)

    if args.test:
        from options_model_tpu.calibration.synthetic import (
            create_synthetic_bates_surface, create_synthetic_heston_surface)
        hp = HestonParams(kappa=2.5, theta=0.04, xi=0.3, rho=-0.7, v0=0.04)
        S0 = 100.0
        if args.model == "vg":
            from options_model_tpu.core.config import VGParams
            from options_model_tpu.calibration.synthetic import (
                create_synthetic_vg_surface)
            true = VGParams(sigma=0.18, theta=-0.14, nu=0.35)
            K, T, iv = create_synthetic_vg_surface(
                true, S0=S0, rate=args.rate, noise_std=args.noise,
                seed=args.seed)
        elif args.model == "bates":
            from options_model_tpu.core.config import BatesParams
            true = BatesParams(heston=hp, lam=0.4, mu_j=-0.12, sigma_j=0.18)
            K, T, iv = create_synthetic_bates_surface(
                true, S0=S0, rate=args.rate, noise_std=args.noise,
                seed=args.seed)
        else:
            true = hp
            K, T, iv = create_synthetic_heston_surface(
                true, S0=S0, rate=args.rate, noise_std=args.noise,
                seed=args.seed)
        log.info(f"Synthetic calibration test: true {true}")
        params, summary = calibrate_fn(
            K, T, iv, S0=S0, rate=args.rate, config=cfg,
            diagnostics_dir=args.diagnostics_dir,
            div_yield=args.div_yield)
        summary["true_params"] = true
        import numpy as np
        got, want = (np.asarray(params.to_array(), np.float64),
                     np.asarray(true.to_array(), np.float64))
        names = (["sigma", "theta", "nu"] if args.model == "vg"
                 else ["kappa", "theta", "xi", "rho", "v0", "lam", "mu_j",
                       "sigma_j"][:len(got)])
        summary["param_errors"] = {n: float(abs(g - w))
                                   for n, g, w in zip(names, got, want)}
    else:
        from options_model_tpu.data.market import fetch_option_chain
        K, T, iv, S0 = fetch_option_chain(args.ticker)
        log.info(f"Calibrating to {len(K)} {args.ticker} options, "
                 f"S0={S0:.2f}")
        params, summary = calibrate_fn(
            K, T, iv, S0=S0, rate=args.rate, config=cfg,
            diagnostics_dir=args.diagnostics_dir,
            div_yield=args.div_yield)

    summary["params"] = params

    if args.price_surface and args.model == "vg":
        raise SystemExit("--price-surface supports heston/bates (the "
                         "shared-path surface backward rides the (S, v) "
                         "variance state)")
    if args.price_surface:
        # Calibrate -> price: the fitted dynamics immediately drive the
        # headline American surface workload (Heston or Bates — the surface
        # pricer composes the jump overlay with the shared (S, v) backward).
        import jax
        import jax.numpy as jnp
        import pandas as pd

        from options_model_tpu.core.config import MCConfig
        from options_model_tpu.pricers.surface_american import (
            price_american_surface)

        nt, nk = args.surface_size
        S0_ = S0
        Ks = jnp.linspace(0.7 * S0_, 1.3 * S0_, nk)
        Ts = jnp.linspace(0.1, 1.0, nt)
        model_kw = (dict(model="bates", bates=params)
                    if args.model == "bates"
                    else dict(model="heston", heston=params))
        P = price_american_surface(
            jax.random.key(args.seed), S0_, Ks, Ts, args.rate,
            MCConfig(n_paths=16384, n_steps=50), cp=-1.0,
            div_yield=args.div_yield, **model_kw)
        import numpy as np
        Km, Tm = np.meshgrid(np.asarray(Ks), np.asarray(Ts))
        pd.DataFrame({"K": Km.ravel(), "T": Tm.ravel(),
                      "price": np.asarray(P).ravel()}).to_csv(
            args.price_surface, index=False)
        log.info(f"Calibrated American {nt}x{nk} surface written to "
                 f"{args.price_surface}")
        summary["surface_csv"] = args.price_surface
    return summary


def main(argv=None) -> int:
    args = parse_args(argv)
    try:
        summary = run(args)
    except Exception as e:
        log.error(f"Calibration failed: {e}")
        return 1
    print(f"Calibrated: {summary['params']}")
    print(f"Weighted IV RMSE: {summary['error']:.6f}")
    if "param_errors" in summary:
        errs = ", ".join(f"{k}={v:.4f}"
                         for k, v in summary["param_errors"].items())
        print(f"Recovery |error| vs truth: {errs}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

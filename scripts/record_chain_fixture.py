"""Record the realistic live-chain fixture used by tests/test_livechain_e2e.py.

The reference's flagship flow is ticker -> chain -> calibrate/train -> price
(options_model_3/options_model_3.py:908-1061, heston_calibration.py:777-806),
but it only ever ran against the live yfinance feed — nothing in its suite
drives the pipeline on a *recorded* chain. This script writes that recording:
a deterministic, bytes-stable JSON snapshot shaped exactly like the raw
yfinance objects (per-expiry calls/puts frames with strike/impliedVolatility/
volume columns, plus a close-price history), generated from KNOWN Heston
dynamics and then corrupted the way real chains are:

- bid-ask quote noise, scaled inversely with vega (wings are quoted sloppier
  than the ATM bucket: half-spread ~0.15 vol-pt ATM, up to ~1.2 vol-pt in
  the wings);
- stale quotes: a few percent of rows still reflect a spot from before the
  last tick (IV re-inverted at the current spot shifts visibly);
- crossed / junk quotes: impliedVolatility below 1%, above 200%, or NaN —
  the parser's sanity range (market.py / reference options_model_2.py:85-111)
  must drop them;
- zero-volume rows (stale strikes nobody trades) — dropped by the liquidity
  filter;
- duplicated rows (yfinance emits these on split chains) — deduped;
- sparse maturities (weekly..annual ladder with gaps) and sparse wings
  (strike coverage narrows for short expiries, $5/$10/$25 exchange spacing).

Because the TRUE parameters are known, the e2e test can assert the entire
pipeline end to end: parse -> calibrate (params recovered through the noise)
-> price (American under fitted params within tolerance of the truth).

Regenerate with:  python scripts/record_chain_fixture.py
(output: tests/data/chain_fixture.json — committed; the test never runs this)
"""

from __future__ import annotations

import json
import os

import numpy as np

FIXTURE_PATH = os.path.join(os.path.dirname(__file__), os.pardir,
                            "tests", "data", "chain_fixture.json")

# SPY-like market, 2025-09-12 flavor. Feller: 2*kappa*theta = 0.171 > xi^2
# = 0.16 (satisfied — the calibrator's penalty stays off the truth).
TRUE = dict(kappa=1.9, theta=0.045, xi=0.4, rho=-0.68, v0=0.030)
S0 = 507.36
RATE = 0.045
SEED = 20250912

# (days-to-expiry, moneyness lo, moneyness hi, strike step $): short-dated
# chains quote a tight ATM ladder at $5; the back months widen to $25.
EXPIRY_LADDER = [
    (7, 0.94, 1.06, 5.0),
    (14, 0.92, 1.08, 5.0),
    (30, 0.88, 1.12, 5.0),
    (58, 0.85, 1.15, 10.0),
    (91, 0.80, 1.20, 10.0),
    (182, 0.75, 1.25, 25.0),
    (364, 0.70, 1.30, 25.0),
]


def _true_iv(K, T, spot):
    """Exact Heston IV at (K, T) via the f64 COS -> implied-vol chain."""
    import jax.numpy as jnp

    from options_model_tpu.calibration.calibrator import (
        _explicit_x64_scope, _try_enable_explicit_x64)
    from options_model_tpu.calibration.charfn import heston_cos_price
    from options_model_tpu.core.config import HestonParams
    from options_model_tpu.pricers.blackscholes import implied_vol

    assert _try_enable_explicit_x64(), "fixture recording needs f64"
    params = HestonParams(**TRUE)
    with _explicit_x64_scope():
        K = jnp.asarray(K, jnp.float64)
        T = jnp.asarray(T, jnp.float64)
        p = heston_cos_price(spot, K, T, RATE, params, cp=1.0,
                             n_terms=512, dtype=jnp.float64)
        return np.asarray(implied_vol(p, spot, K, T, RATE, cp=1.0),
                          np.float64)


def main():
    import jax

    from options_model_tpu.pricers.blackscholes import bs_vega

    rng = np.random.default_rng(SEED)

    with jax.default_device(jax.devices("cpu")[0]):
        expiries = {}
        for days, lo, hi, step in EXPIRY_LADDER:
            T = days / 365.0
            strikes = np.arange(np.ceil(lo * S0 / step) * step,
                                hi * S0 + 1e-9, step)
            iv_true = _true_iv(strikes, np.full_like(strikes, T), S0)
            # Stale rows: quoted when the spot was 0.4% lower — their listed
            # IV is the one that reprices the option at the STALE spot.
            iv_stale = _true_iv(strikes, np.full_like(strikes, T),
                                S0 * 0.996)

            vega = np.asarray(bs_vega(S0, strikes, T, RATE, iv_true),
                              np.float64)
            vnorm = vega / vega.max()
            half_spread = np.clip(0.012 * (1.0 - vnorm) + 0.0015,
                                  0.0015, 0.012)

            sides = {}
            for side in ("calls", "puts"):
                eps = rng.normal(0.0, half_spread)
                iv = iv_true + eps
                stale = rng.random(len(strikes)) < 0.04
                iv = np.where(stale, iv_stale + eps, iv)
                # volume: lognormal, decaying in |moneyness|; ~8% zero rows
                vol = np.round(np.exp(rng.normal(4.0, 1.5) * vnorm
                                      + rng.normal(0.0, 0.8, len(strikes))))
                vol = np.where(rng.random(len(strikes)) < 0.08, 0.0, vol)
                rows = [[float(k), float(v), float(q)]
                        for k, v, q in zip(strikes, iv, vol)]
                # junk quotes the parser must reject
                k_atm = float(strikes[len(strikes) // 2])
                rows.append([float(strikes[0]), 0.005, 12.0])   # crossed
                rows.append([float(strikes[-1]), 2.6, 3.0])     # fat-finger
                rows.append([k_atm, float("nan"), 40.0])        # no IV
                # duplicated row (split-chain artifact)
                rows.append(rows[len(strikes) // 2])
                sides[side] = rows
            expiries[str(days)] = sides

    # 60 business days of closes ending at S0, GBM-ish with vol ~ sqrt(v0)
    logret = rng.normal(0.0, np.sqrt(TRUE["v0"] / 252.0), 59)
    closes = S0 * np.exp(np.concatenate([[0.0], np.cumsum(logret)]))
    closes = (closes * S0 / closes[-1]).tolist()  # end exactly at S0

    fixture = {
        "meta": {
            "true_params": TRUE, "S0": S0, "rate": RATE, "seed": SEED,
            "note": "deterministic recording; regenerate via "
                    "scripts/record_chain_fixture.py",
        },
        "closes": closes,
        # keys are DAYS-TO-EXPIRY: the loader maps them to calendar dates at
        # test time so fetch_option_chain's T computation stays stable.
        "expiries": expiries,
    }
    os.makedirs(os.path.dirname(FIXTURE_PATH), exist_ok=True)
    with open(FIXTURE_PATH, "w") as f:
        json.dump(fixture, f, indent=1)
    n = sum(len(s[side]) for s in expiries.values()
            for side in ("calls", "puts"))
    print(f"wrote {FIXTURE_PATH}: {len(expiries)} expiries, {n} quote rows")


if __name__ == "__main__":
    main()

"""Drive the library through its public API on the real TPU chip."""
import time
import jax, jax.numpy as jnp
print("devices:", jax.devices())

from options_model_tpu.core import HestonParams, MCConfig, LSMConfig, OptionSpec
from options_model_tpu.core.config import PUT, CALL
from options_model_tpu.pricers import (
    bs_price, bs_greeks, crr_american, price_american, price_european_mc,
    price_barrier_mc)
from options_model_tpu.pricers.european import make_terminal_sampler

key = jax.random.key(2026)
S0, K, T, r, sig = 100.0, 100.0, 0.5, 0.05, 0.2
put = OptionSpec(strike=K, rate=r, cp=PUT, sigma=sig)
call = OptionSpec(strike=K, rate=r, cp=CALL, sigma=sig)

# 1. European MC vs BS closed form on TPU
cfg = MCConfig(n_paths=262_144, n_steps=50)
sampler = make_terminal_sampler("gbm", S0, r, T, sigma=sig)
t0 = time.time()
p, se, n = price_european_mc(key, sampler, call, T, cfg)
p, se = float(p), float(se)
t1 = time.time()
bs = float(bs_price(S0, K, T, r, sig, 1.0))
print(f"[EU ] MC {p:.4f} +- {se:.4f} (n={int(n)})  BS {bs:.4f}  |z|={abs(p-bs)/se:.2f}  {t1-t0:.1f}s")
assert abs(p - bs) < 4*se

# 2. American put LSM+CV vs CRR binomial on TPU (BASELINE configs[0])
mc = MCConfig(n_paths=500_000, n_steps=50)
lsm = LSMConfig(regressor="poly")
t0 = time.time()
am, se2 = price_american(key, S0, T, put, mc, lsm)
am = float(am); t1 = time.time()
oracle = crr_american(S0, K, T, r, sig, cp=-1.0, n_steps=4096)
rel = abs(am - oracle)/oracle
print(f"[AM ] LSM+CV {am:.4f}  CRR {oracle:.4f}  rel err {rel*100:.3f}%  {t1-t0:.1f}s")
assert rel < 0.001, f"American not within 0.1%: {rel}"

# 3. Heston American put (BASELINE configs[2])
hp = HestonParams(kappa=2.0, theta=0.04, xi=0.3, rho=-0.7, v0=0.04).validate()
spec_h = OptionSpec(strike=K, rate=r, cp=PUT, sigma=None)
t0=time.time()
amh, _ = price_american(key, S0, T, spec_h, mc, LSMConfig(regressor="poly", use_control_variate=False), model="heston", heston=hp)
print(f"[AMH] Heston American put {float(amh):.4f}  {time.time()-t0:.1f}s")

# 4. Greeks via AD
g = {k: float(v) for k, v in bs_greeks(S0, K, T, r, sig, 1.0).items()}
print("[GRK]", {k: round(v,4) for k,v in g.items()})

# 5. Barrier
ko, _ = price_barrier_mc(key, S0, T, call, barrier=120.0, barrier_type="up-and-out", mc=MCConfig(n_paths=200_000, n_steps=64))
print(f"[BAR] up-and-out 120 call {float(ko):.4f} (vanilla {bs:.4f})")

# Probes: invalid inputs must raise cleanly
for bad in [lambda: OptionSpec(strike=-5.0, rate=r).validate(),
            lambda: HestonParams(kappa=2.0, theta=0.04, xi=0.3, rho=-2.0, v0=0.04).validate(),
            lambda: MCConfig(path_block=100).validate()]:
    try:
        bad(); print("PROBE FAIL: no error raised")
    except ValueError as e:
        print("[PRB] ValueError:", str(e)[:60])

# Probe: odd path count rounds up, still prices
podd, _, nodd = price_european_mc(key, sampler, call, T, MCConfig(n_paths=12_345, n_steps=10))
print(f"[PRB] n_paths=12345 -> n={int(nodd)} price {float(podd):.4f}")
print("ALL DRIVES OK")

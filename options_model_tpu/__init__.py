"""options_model_tpu — a TPU-native options-pricing framework built on JAX/XLA/Pallas.

A from-scratch rebuild of the capabilities of the reference ``Levicoz/Options-model``
toolkit (see SURVEY.md) designed TPU-first:

- pure-functional, PRNG-explicit pricing core (``jit``-able end to end)
- ``lax.scan`` over time steps, ``vmap`` over paths/strikes/maturities
- fused Pallas path-simulation kernels with counter-based on-chip RNG
- ``shard_map`` over device meshes for batch grids and path sharding
- Greeks via autodiff; Heston calibration via characteristic-function/COS pricing
- Flax IV-surface network with vega-weighted loss and no-arbitrage penalties

Layer map (mirrors SURVEY.md §1):
  core/        config pytrees, RNG discipline, streaming stats, time grids
  models/      GBM / Heston / local-vol path dynamics
  ops/         Pallas TPU kernels + XLA fallbacks
  pricers/     Black-Scholes closed form, European MC, American LSM, binomial oracle
  surface/     implied-volatility-surface neural network
  calibration/ Heston characteristic-function calibration
  parallel/    device meshes, sharded batch pricers
  data/        market-data adapters and synthetic oracles
  apps/        CLI, curve orchestration, plotting, UI
  utils/       logging, profiling, plotting helpers
"""

__version__ = "0.1.0"

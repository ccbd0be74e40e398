"""Distributed execution (reference §2.2 rebuilt on jax.sharding).

The reference's only real parallelism was an OS-process fan-out of independent
(S0, curve) tasks with pre-derived seeds (options_model_3/options_model_3.py:
1044-1056). Here that becomes:

- task parallelism: ``shard_map`` over a flattened strike x maturity x S0 task
  axis on the mesh — per-task RNG via fold_in on the GLOBAL task index, so
  results are identical for any device count (parallel/batch.py);
- path parallelism: one huge pricing with the PATHS axis sharded — per-shard
  simulation keyed by global block ids, Welford partials and LSM Gram blocks
  reduced with psum over ICI (exactly equal to the unsharded computation);
- multi-host entry helpers (parallel/mesh.py).
"""

from options_model_tpu.parallel.mesh import make_mesh, device_count
from options_model_tpu.parallel.batch import (
    price_american_grid,
    price_american_grid_2d,
    price_european_sharded,
    price_american_sharded_paths,
    price_american_bracket_sharded,
)

__all__ = [
    "make_mesh",
    "device_count",
    "price_american_grid",
    "price_american_grid_2d",
    "price_european_sharded",
    "price_american_sharded_paths",
    "price_american_bracket_sharded",
]

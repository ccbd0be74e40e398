"""IV-surface training loop: jitted epochs, early stopping, orbax checkpoints.

Rebuilds IVSurfaceTrainer (NN_training_stock_iv.py:416-634) on optax:
- 85/15 split with a seeded permutation (:456-478)
- AdamW + cosine (or constant) schedule (:480-485), grad-clip 1.0 (:602)
- vega-weighted MSE with weights carried alongside the samples (defect fix)
- finite-difference arbitrage penalty each step (:595-599)
- best-state early stopping with patience (:524-543)
- orbax checkpoint save AND restore (the reference never restored, SURVEY.md §5)

The per-epoch work (scan over minibatches) compiles once; the patience logic
stays host-side, matching the reference's epoch granularity.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from options_model_tpu.core.config import SurfaceTrainConfig
from options_model_tpu.surface.loss import arbitrage_penalty_fd, vega_weights
from options_model_tpu.surface.network import init_params, make_network
from options_model_tpu.surface.scaler import SurfaceScaler


@dataclasses.dataclass
class SurfaceTrainResult:
    params: Any
    scaler: SurfaceScaler
    config: SurfaceTrainConfig
    best_val_loss: float
    train_losses: List[float]
    val_losses: List[float]
    epochs_run: int


def _pad_to_batches(n: int, batch: int) -> int:
    return ((n + batch - 1) // batch) * batch


def train_iv_surface(K, T, sigma_iv, S0: float,
                     cfg: Optional[SurfaceTrainConfig] = None,
                     rate: float = 0.05,
                     seed: Optional[int] = None,
                     diagnostics_dir: Optional[str] = None
                     ) -> SurfaceTrainResult:
    """Train the IV network on observations (K_i, T_i, iv_i) around spot S0.

    ``diagnostics_dir``: emit the 2x2 training-diagnostics figure there
    (iv_surface_training.png) — the reference auto-plots these at the end of
    every training run (NN_training_stock_iv.py:451-452,636-711)."""
    cfg = (cfg or SurfaceTrainConfig()).validate()
    seed = cfg.seed if seed is None else seed

    K = np.asarray(K, np.float32)
    T = np.asarray(T, np.float32)
    y = np.asarray(sigma_iv, np.float32)

    # Split the ORIGINAL observations first — augmenting before the split
    # would put near-duplicates of every training point into the validation
    # set, optimistically biasing val loss and early stopping.
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(y))
    n_val = max(1, int(len(y) * cfg.val_split))
    val_idx, tr_idx = perm[:n_val], perm[n_val:]
    Ktr, Ttr, ytr = K[tr_idx], T[tr_idx], y[tr_idx]
    Kva, Tva, yva = K[val_idx], T[val_idx], y[val_idx]

    if cfg.use_augmentation:
        # 3 noisy copies per TRAINING observation (DataProcessor._augment_data,
        # NN_training_stock_iv.py:372-388): regularizes tiny option chains.
        # Noise perturbs only the target IV, never (K, T).
        rng_aug = np.random.default_rng(seed)
        noise = rng_aug.normal(0.0, 0.005, (3, len(ytr))).astype(np.float32)
        Ktr = np.tile(Ktr, 4)
        Ttr = np.tile(Ttr, 4)
        ytr = np.concatenate([ytr] + [np.maximum(ytr + n, 0.01) for n in noise])

    # Scaler fit on the training fold only (no leakage); (m, tau) statistics
    # are augmentation-invariant since noise only touches y.
    scaler = SurfaceScaler.fit(np.log(Ktr / S0), Ttr, S0)

    def features(Kf, Tf):
        m_norm, tau_norm = scaler.transform(np.log(Kf / S0), Tf)
        return np.stack([m_norm, tau_norm], -1).astype(np.float32)

    def weights(Kf, Tf, yf):
        if cfg.use_vega_weighting:
            return np.asarray(vega_weights(Kf, Tf, yf, S0, rate), np.float32)
        return np.ones_like(yf)

    # Weights travel with their samples (defect fix, SURVEY §2.4).
    Xtr, wtr = features(Ktr, Ttr), weights(Ktr, Ttr, ytr)
    Xva, wva = features(Kva, Tva), weights(Kva, Tva, yva)

    # Pad the training set to whole batches with zero-weight rows: static
    # shapes for the scan, no partial-batch special case.
    batch = min(cfg.batch_size, len(Xtr))
    n_pad = _pad_to_batches(len(Xtr), batch)
    pad = n_pad - len(Xtr)
    Xtr = np.concatenate([Xtr, np.zeros((pad, 2), np.float32)])
    ytr = np.concatenate([ytr, np.zeros((pad,), np.float32)])
    wtr = np.concatenate([wtr, np.zeros((pad,), np.float32)])
    n_batches = n_pad // batch

    net = make_network(cfg)
    key = jax.random.key(seed)
    init_key, key = jax.random.split(key)
    params = init_params(cfg, init_key, float(y.mean()))

    if cfg.use_cosine_schedule:
        schedule = optax.cosine_decay_schedule(cfg.lr, cfg.epochs * n_batches)
    else:
        schedule = cfg.lr
    tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip),
                     optax.adamw(schedule, weight_decay=cfg.weight_decay))
    opt_state = tx.init(params)

    Xtr_j, ytr_j, wtr_j = jnp.asarray(Xtr), jnp.asarray(ytr), jnp.asarray(wtr)
    Xva_j, yva_j, wva_j = jnp.asarray(Xva), jnp.asarray(yva), jnp.asarray(wva)

    def loss_fn(p, xb, yb, wb, dropout_key):
        pred = net.apply(p, xb, deterministic=False,
                         rngs={"dropout": dropout_key})[:, 0]
        mse = jnp.sum(wb * (pred - yb) ** 2) / jnp.maximum(jnp.sum(wb), 1e-8)
        arb = arbitrage_penalty_fd(
            lambda x: net.apply(p, x, deterministic=True), xb, scaler,
            cfg.lambda_butterfly, cfg.lambda_calendar)
        return mse + arb

    @jax.jit
    def train_epoch(params, opt_state, epoch_key):
        perm_key, drop_key = jax.random.split(epoch_key)
        order = jax.random.permutation(perm_key, n_pad).reshape(n_batches, batch)

        def step(carry, idx):
            params, opt_state = carry
            xb, yb, wb = Xtr_j[idx], ytr_j[idx], wtr_j[idx]
            dk = jax.random.fold_in(drop_key, idx[0])
            loss, grads = jax.value_and_grad(loss_fn)(params, xb, yb, wb, dk)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), order)
        return params, opt_state, jnp.mean(losses)

    @jax.jit
    def val_loss(params):
        pred = net.apply(params, Xva_j, deterministic=True)[:, 0]
        return jnp.sum(wva_j * (pred - yva_j) ** 2) / jnp.maximum(jnp.sum(wva_j), 1e-8)

    best_val = float("inf")
    best_params = params
    patience = 0
    train_losses: List[float] = []
    val_losses: List[float] = []
    epochs_run = 0

    for epoch in range(cfg.epochs):
        key, ek = jax.random.split(key)
        params, opt_state, tr_loss = train_epoch(params, opt_state, ek)
        vl = float(val_loss(params))
        train_losses.append(float(tr_loss))
        val_losses.append(vl)
        epochs_run = epoch + 1
        if vl < best_val - 1e-6:
            best_val = vl
            best_params = jax.tree.map(jnp.copy, params)
            patience = 0
        else:
            patience += 1
            if patience >= cfg.patience:
                break

    result = SurfaceTrainResult(params=best_params, scaler=scaler, config=cfg,
                                best_val_loss=best_val,
                                train_losses=train_losses,
                                val_losses=val_losses, epochs_run=epochs_run)

    if diagnostics_dir is not None:
        from options_model_tpu.utils.plotting import plot_training_diagnostics
        os.makedirs(diagnostics_dir, exist_ok=True)
        # Model-vs-market on the ORIGINAL (unaugmented) observations.
        iv_model = np.asarray(
            net.apply(best_params, jnp.asarray(features(K, T)),
                      deterministic=True)[:, 0])
        plot_training_diagnostics(
            train_losses, val_losses, K, T, y, iv_model,
            out_path=os.path.join(diagnostics_dir, "iv_surface_training.png"))

    return result


# --- Checkpointing (save AND restore, unlike the reference) ------------------

def save_checkpoint(path: str, result: SurfaceTrainResult) -> None:
    """Persist {params, scaler, config, val_loss} with orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = {
        "params": result.params,
        "scaler": result.scaler.to_dict(),
        "config": dataclasses.asdict(result.config),
        "best_val_loss": result.best_val_loss,
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, ckpt, force=True)


def restore_checkpoint(path: str) -> SurfaceTrainResult:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        raw = ckptr.restore(path)
    cfg = SurfaceTrainConfig(**jax.tree.map(lambda x: x.item() if hasattr(x, "item") else x,
                                            raw["config"]))
    return SurfaceTrainResult(
        params=raw["params"],
        scaler=SurfaceScaler.from_dict(raw["scaler"]),
        config=cfg,
        best_val_loss=float(raw["best_val_loss"]),
        train_losses=[], val_losses=[], epochs_run=0,
    )

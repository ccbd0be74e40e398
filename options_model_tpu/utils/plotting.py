"""Plotting (reference component #19): Plotly value-vs-days-to-expiry curves
and matplotlib diagnostics grids. Import-gated — every function degrades to a
no-op returning None when the plotting stack is unavailable, so headless/CI
paths never break on a visualization import.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

try:  # pragma: no cover
    import plotly.graph_objects as go
    _PLOTLY = True
except ImportError:  # pragma: no cover
    go = None
    _PLOTLY = False

try:  # pragma: no cover
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    _MPL = True
except ImportError:  # pragma: no cover
    plt = None
    _MPL = False


def plotly_available() -> bool:
    return _PLOTLY


def plot_option_curves(df, s0_list: Sequence[float], S0_live: float, K: float,
                       sigma: Optional[float], r: float, option_type: str,
                       ticker: str, model_name: str, ivs_for_plot=None,
                       show: bool = False, html_path: Optional[str] = None):
    """Value-vs-days-to-expiry curves, one per S0, live spot highlighted,
    reversed x-axis (plot_option_curves[_nn],
    options_model_3/options_model_3.py:745-861).

    df needs columns ['S0', 'Days to Expiry', 'Option Value'].
    """
    if not _PLOTLY:
        return None

    fig = go.Figure()
    for idx, S0 in enumerate(s0_list):
        curve = df[df["S0"] == S0]
        live = int(S0) == int(S0_live)
        name = f"S0 = ${S0}"
        if ivs_for_plot is not None:
            name += f" (IV={ivs_for_plot[idx]:.2%})"
        if live:
            name += " (Live)"
        if "StdErr" in curve.columns and live:
            # +-1 sigma MC band on the live curve (options_ui.py:72-99).
            x = list(curve["Days to Expiry"])
            lo = list(curve["Option Value"] - curve["StdErr"])
            hi = list(curve["Option Value"] + curve["StdErr"])
            fig.add_trace(go.Scatter(
                x=x + x[::-1], y=hi + lo[::-1], fill="toself",
                fillcolor="rgba(99,110,250,0.15)",
                line=dict(color="rgba(0,0,0,0)"), showlegend=False,
                hoverinfo="skip", name=f"{name} +-1sd"))
        fig.add_trace(go.Scatter(
            x=curve["Days to Expiry"], y=curve["Option Value"], mode="lines",
            name=name,
            line=dict(width=4 if live else 2, dash="solid" if live else "dot"),
            hovertemplate=("S0: $%{text}<br>Days to Expiry: %{x:.2f}<br>"
                           "Option Value: %{y:.4f}<extra></extra>"),
            text=[S0] * len(curve),
        ))

    sub = f"{ticker} | K=${K}" + (f" | sigma={sigma:.2f}" if sigma else "")
    fig.update_layout(
        title=dict(text=(f"{model_name} American {option_type.capitalize()} "
                         f"Option Value vs. Days to Expiry<br><sup>{sub} | "
                         f"r={r:.2%}</sup>"), x=0.5, xanchor="center"),
        legend=dict(title="Spot Price (S0)", yanchor="top", y=0.99,
                    xanchor="left", x=1.02),
        template="plotly_white", dragmode="pan",
    )
    fig.update_xaxes(title="Days to Expiry", autorange="reversed",
                     showgrid=True, ticks="outside", showline=True)
    fig.update_yaxes(title="Option Value", showgrid=True, ticks="outside",
                     showline=True)
    if html_path:
        fig.write_html(html_path)
    if show:
        fig.show()
    return fig


def plot_training_diagnostics(train_losses: List[float], val_losses: List[float],
                              K: np.ndarray, T: np.ndarray, iv_market: np.ndarray,
                              iv_model: np.ndarray, out_path: Optional[str] = None):
    """2x2 matplotlib training diagnostics (NN_training_stock_iv.py:636-711):
    loss curves, model-vs-market scatter, residuals, residual histogram."""
    if not _MPL:
        return None
    fig, ((ax1, ax2), (ax3, ax4)) = plt.subplots(2, 2, figsize=(13, 9))

    epochs = np.arange(1, len(train_losses) + 1)
    ax1.plot(epochs, train_losses, "b-", label="train", alpha=0.8)
    ax1.plot(epochs, val_losses, "r-", label="val", alpha=0.8)
    ax1.set_yscale("log")
    ax1.set_xlabel("Epoch"); ax1.set_ylabel("Loss"); ax1.legend()
    ax1.set_title("Training / Validation Loss")

    sc = ax2.scatter(iv_market, iv_model, c=T, s=16, alpha=0.7, cmap="viridis")
    lims = [min(iv_market.min(), iv_model.min()), max(iv_market.max(), iv_model.max())]
    ax2.plot(lims, lims, "r--", alpha=0.8)
    ax2.set_xlabel("Market IV"); ax2.set_ylabel("Model IV")
    ax2.set_title("Model vs Market IV")
    fig.colorbar(sc, ax=ax2, label="T (years)")

    resid = iv_model - iv_market
    ax3.scatter(iv_market, resid, s=16, alpha=0.6)
    ax3.axhline(0.0, color="r", linestyle="--", alpha=0.8)
    ax3.set_xlabel("Market IV"); ax3.set_ylabel("Model - Market")
    ax3.set_title("Residuals"); ax3.grid(alpha=0.3)

    ax4.hist(resid, bins=30, alpha=0.8)
    ax4.set_title(f"Residual histogram (RMSE={np.sqrt(np.mean(resid**2)):.5f})")

    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=110)
    return fig


def plot_calibration_results(market_ivs: np.ndarray, model_ivs: np.ndarray,
                             vegas: np.ndarray, params, error: float,
                             regime: str, out_path: Optional[str] = None):
    """2x2 calibration diagnostics (heston_calibration.py:597-709)."""
    if not _MPL:
        return None
    fig, ((ax1, ax2), (ax3, ax4)) = plt.subplots(2, 2, figsize=(13, 9))

    sc = ax1.scatter(market_ivs, model_ivs, c=vegas, s=20, alpha=0.7, cmap="viridis")
    lims = [market_ivs.min(), market_ivs.max()]
    ax1.plot(lims, lims, "r--", alpha=0.8)
    ax1.set_xlabel("Market IV"); ax1.set_ylabel("Model IV")
    ax1.set_title("Model vs Market IV"); fig.colorbar(sc, ax=ax1, label="Vega")

    resid = model_ivs - market_ivs
    ax2.scatter(market_ivs, resid, s=20, alpha=0.7)
    ax2.axhline(0.0, color="r", linestyle="--", alpha=0.8)
    ax2.set_xlabel("Market IV"); ax2.set_ylabel("Model - Market")
    ax2.set_title("Residuals"); ax2.grid(alpha=0.3)

    ax3.hist(resid, bins=25, alpha=0.8)
    ax3.set_title("Residual distribution")

    hp = getattr(params, "heston", params)  # BatesParams nests the diffusion
    if hasattr(hp, "kappa"):
        lines = [f"kappa = {hp.kappa:.4f}", f"theta = {hp.theta:.4f}",
                 f"xi    = {hp.xi:.4f}", f"rho   = {hp.rho:.4f}",
                 f"v0    = {hp.v0:.4f}"]
    else:  # VGParams (no variance state, no Feller condition)
        lines = [f"sigma = {hp.sigma:.4f}", f"theta = {hp.theta:.4f}",
                 f"nu    = {hp.nu:.4f}"]
    if hasattr(params, "lam"):
        lines += [f"lam   = {params.lam:.4f}", f"mu_j  = {params.mu_j:.4f}",
                  f"sig_j = {params.sigma_j:.4f}"]
    lines += [f"RMSE  = {error:.6f}"]
    if hasattr(params, "feller_condition"):
        lines += [f"Feller: "
                  f"{'ok' if params.feller_condition() else 'VIOLATED'}"]
    lines += [f"Regime: {regime}"]
    for i, line in enumerate(lines):
        ax4.text(0.08, 0.9 - 0.11 * i, line, transform=ax4.transAxes,
                 family="monospace")
    ax4.axis("off"); ax4.set_title("Calibration Results")

    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=110)
    return fig


def plot_sample_paths(S_paths, T: float, n_show: int = 100,
                      out_path: Optional[str] = None, title: Optional[str] = None):
    """Simulated price paths over time (the reference's plot_paths feature,
    options_model_v1.5.py:130-138): up to n_show paths, alpha-blended.

    S_paths: (n_steps+1, n_paths) array-like. Headless (Agg) by default;
    writes a PNG when out_path is given."""
    if not _MPL:
        return None
    S = np.asarray(S_paths)
    n_steps = S.shape[0] - 1
    t = np.linspace(0.0, T, n_steps + 1)
    fig, ax = plt.subplots(figsize=(10, 6))
    for i in range(min(n_show, S.shape[1])):
        ax.plot(t, S[:, i], alpha=0.5, linewidth=0.8)
    ax.set_title(title or "Simulated Stock Price Paths")
    ax.set_xlabel("Time to Maturity")
    ax.set_ylabel("Stock Price")
    ax.grid(alpha=0.4)
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=110)
    return fig

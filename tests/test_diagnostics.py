"""Auto-wired diagnostics (VERDICT r1 missing #2): training and calibration
runs emit the reference's 2x2 matplotlib figures when a diagnostics dir is
given (NN_training_stock_iv.py:451-452,636-711;
heston_calibration.py:582-594,597-709), headlessly (Agg backend)."""

import numpy as np
import pytest

from options_model_tpu.core.config import (
    CalibrationConfig, HestonParams, SurfaceTrainConfig)

mpl = pytest.importorskip("matplotlib")

FAST_SURFACE = SurfaceTrainConfig(epochs=30, batch_size=256, hidden_dim=16,
                                  num_hidden_layers=2, dropout=0.0,
                                  patience=30, use_vega_weighting=False,
                                  lr=2e-3)


class TestTrainingDiagnostics:
    @pytest.mark.slow
    def test_train_emits_png(self, tmp_path):
        from options_model_tpu.data.synthetic import synthetic_smile_surface
        from options_model_tpu.surface.train import train_iv_surface

        K, T, iv, S0 = synthetic_smile_surface()
        train_iv_surface(K, T, iv, S0, FAST_SURFACE,
                         diagnostics_dir=str(tmp_path))
        png = tmp_path / "iv_surface_training.png"
        assert png.exists() and png.stat().st_size > 10_000

    @pytest.mark.slow
    def test_train_surface_cli(self, tmp_path):
        from options_model_tpu.apps.train_surface import main

        rc = main(["--test", "--epochs", "30", "--hidden-dim", "16",
                   "--layers", "2", "--diagnostics-dir", str(tmp_path),
                   "--save", str(tmp_path / "ckpt")])
        assert rc == 0
        assert (tmp_path / "iv_surface_training.png").exists()
        # checkpoint written AND restorable
        from options_model_tpu.surface.model import IVSurfaceModel
        model = IVSurfaceModel.restore(str(tmp_path / "ckpt"))
        assert 0.05 < model.get_sigma_iv(100.0, 100.0, 0.25) < 1.0


class TestCalibrationDiagnostics:
    @pytest.mark.slow
    def test_calibrate_emits_png(self, tmp_path):
        from options_model_tpu.calibration.calibrator import (
            calibrate_heston_to_data)
        from options_model_tpu.calibration.synthetic import (
            create_synthetic_heston_surface)

        true = HestonParams(kappa=2.5, theta=0.04, xi=0.3, rho=-0.7, v0=0.04)
        K, T, iv = create_synthetic_heston_surface(true)
        cfg = CalibrationConfig(optimization_methods=("L-BFGS-B",))
        params, summary = calibrate_heston_to_data(
            K, T, iv, S0=100.0, config=cfg, diagnostics_dir=str(tmp_path))
        png = tmp_path / "heston_calibration.png"
        assert png.exists() and png.stat().st_size > 10_000
        assert summary["error"] < 0.01

    def test_calibrate_cli_test_mode(self, tmp_path, capsys):
        from options_model_tpu.apps.calibrate import main

        rc = main(["--test", "--methods", "L-BFGS-B",
                   "--diagnostics-dir", str(tmp_path)])
        assert rc == 0
        assert (tmp_path / "heston_calibration.png").exists()
        out = capsys.readouterr().out
        assert "Recovery |error| vs truth" in out

    def test_model_ivs_requires_calibration(self):
        from options_model_tpu.calibration.calibrator import (
            HestonCalibrator, MarketSurface)
        surf = MarketSurface(strikes=np.array([100.0]),
                             expiries=np.array([0.5]),
                             ivs=np.array([0.2]), S0=100.0)
        with pytest.raises(ValueError, match="calibrate"):
            HestonCalibrator().model_ivs(surf)


class TestCalibrateThenPrice:
    @pytest.mark.slow
    def test_calibrate_cli_prices_surface(self, tmp_path):
        """--price-surface runs the headline American surface workload under
        the freshly calibrated parameters (calibrate -> price pipeline)."""
        import pandas as pd
        from options_model_tpu.apps.calibrate import main

        csv = str(tmp_path / "calibrated_surface.csv")
        rc = main(["--test", "--methods", "L-BFGS-B",
                   "--price-surface", csv, "--surface-size", "3", "4"])
        assert rc == 0
        df = pd.read_csv(csv)
        assert len(df) == 12 and (df["price"] >= 0).all()
        # puts increase in strike within each maturity
        for T, g in df.groupby("T"):
            v = g.sort_values("K")["price"].values
            assert (np.diff(v) > -1e-3).all()

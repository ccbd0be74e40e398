"""Resumable MC: interrupted runs resume the exact stream and reproduce the
uninterrupted result bitwise."""

import os

import numpy as np
import pytest

from options_model_tpu.core.config import CALL, MCConfig, OptionSpec
from options_model_tpu.pricers.european import make_terminal_sampler
from options_model_tpu.pricers.resumable import (
    MCJobState,
    run_resumable_european,
)

SPEC = OptionSpec(strike=100.0, rate=0.05, cp=CALL, sigma=0.2)
CFG = MCConfig(n_paths=64 * 1024, n_steps=8, path_block=1024)


def _sampler():
    return make_terminal_sampler("gbm", 100.0, 0.05, 0.5, sigma=0.2,
                                 engine="xla")


class TestResumable:
    def test_uninterrupted_run(self, tmp_path):
        ckpt = str(tmp_path / "job.json")
        price, stderr, n = run_resumable_european(
            _sampler(), SPEC, 0.5, CFG, seed=7, checkpoint_path=ckpt,
            blocks_per_flush=16)
        assert n == 64 * 1024
        assert 3.0 < price < 8.0
        assert os.path.exists(ckpt)

    def test_resume_reproduces_bitwise(self, tmp_path):
        # Full run in one go...
        full_ckpt = str(tmp_path / "full.json")
        p_full, se_full, _ = run_resumable_european(
            _sampler(), SPEC, 0.5, CFG, seed=7, checkpoint_path=full_ckpt,
            blocks_per_flush=16)

        # ...vs a run "killed" after 32 of 64 blocks, then resumed.
        part_ckpt = str(tmp_path / "part.json")
        run_resumable_european(_sampler(), SPEC, 0.5, CFG, seed=7,
                               checkpoint_path=part_ckpt, blocks_per_flush=16,
                               max_blocks=32)
        st = MCJobState.load(part_ckpt)
        assert st.blocks_done == 32
        p_res, se_res, n = run_resumable_european(
            _sampler(), SPEC, 0.5, CFG, seed=7, checkpoint_path=part_ckpt,
            blocks_per_flush=16)
        assert n == 64 * 1024
        assert p_res == p_full
        assert se_res == se_full

    def test_seed_mismatch_rejected(self, tmp_path):
        ckpt = str(tmp_path / "job.json")
        MCJobState(seed=1, blocks_done=4, count=4096.0, mean=5.0, m2=10.0).save(ckpt)
        with pytest.raises(ValueError):
            run_resumable_european(_sampler(), SPEC, 0.5, CFG, seed=2,
                                   checkpoint_path=ckpt)

    def test_state_round_trip(self, tmp_path):
        path = str(tmp_path / "s.json")
        st = MCJobState(seed=3, blocks_done=12, count=100.0, mean=1.5, m2=2.5)
        st.save(path)
        st2 = MCJobState.load(path)
        assert st2 == st


class TestCheckpointUnits:
    def test_legacy_checkpoint_rejected(self, tmp_path):
        """Pre-r2 checkpoints (raw-path Welford units, no stat_unit field)
        must be refused, not silently merged (review finding r2)."""
        import json
        from options_model_tpu.pricers.resumable import MCJobState

        p = tmp_path / "legacy.json"
        p.write_text(json.dumps({"seed": 1, "blocks_done": 4, "count": 4096.0,
                                 "mean": 5.0, "m2": 10.0}))
        with pytest.raises(ValueError, match="stat_unit"):
            MCJobState.load(str(p))

    def test_unit_mismatch_rejected(self, tmp_path):
        import json
        from options_model_tpu.pricers.resumable import MCJobState

        p = tmp_path / "pm.json"
        p.write_text(json.dumps({"seed": 1, "blocks_done": 4, "count": 2048.0,
                                 "mean": 5.0, "m2": 10.0,
                                 "stat_unit": "pair_mean"}))
        with pytest.raises(ValueError, match="antithetic"):
            MCJobState.load(str(p), expect_unit="path")

    def test_round_trip_preserves_unit(self, tmp_path):
        from options_model_tpu.pricers.resumable import MCJobState

        st = MCJobState(seed=7, blocks_done=2, count=8.0, mean=1.0, m2=0.5,
                        stat_unit="path")
        st.save(str(tmp_path / "s.json"))
        back = MCJobState.load(str(tmp_path / "s.json"), expect_unit="path")
        assert back == st

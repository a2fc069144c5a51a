"""Checkpoint manager roundtrip + CLI end-to-end on synthetic data."""

import json
import pathlib

import jax
import numpy as np
import pytest

from pytorch_news_recommender_tpu.config import synthetic_config
from pytorch_news_recommender_tpu.data import synthetic
from pytorch_news_recommender_tpu.data.loader import train_batches
from pytorch_news_recommender_tpu.train.checkpoint import (
    CheckpointManager,
    load_config,
)
from pytorch_news_recommender_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def small_setup(tmp_path_factory):
    cfg = synthetic_config()
    ds = synthetic.generate(cfg.data, seed=3, n_train=128, n_dev=32)
    trainer = Trainer(cfg, ds)
    state = trainer.init_state(seed=0)
    return cfg, ds, trainer, state


def test_checkpoint_roundtrip(small_setup, tmp_path):
    cfg, ds, trainer, state = small_setup
    rng = jax.random.PRNGKey(0)
    batch = next(train_batches(ds.train, 32, np.random.default_rng(0)))
    state, _ = trainer.run_step(state, batch, rng)

    mngr = CheckpointManager(tmp_path / "ckpt", cfg)
    mngr.save(int(state.step), state, {"auc": 0.6, "loss": 1.0})
    assert mngr.best_step() == 1
    assert load_config(tmp_path / "ckpt").model.name == cfg.model.name

    template = trainer.init_state(seed=7)  # different init
    restored = mngr.restore(template)
    # params AND optimizer state AND step restored exactly
    assert int(restored.step) == int(state.step)
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    mo_a = jax.tree_util.tree_leaves(state.opt_state)
    mo_b = jax.tree_util.tree_leaves(restored.opt_state)
    for x, y in zip(mo_a, mo_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert mngr.restore_metrics()["auc"] == pytest.approx(0.6)
    mngr.close()


def test_best_auc_retention(small_setup, tmp_path):
    cfg, ds, trainer, _ = small_setup
    # fresh state: the roundtrip test's run_step donated the fixture's one
    state = trainer.init_state(seed=11)
    mngr = CheckpointManager(tmp_path / "best", cfg, max_to_keep=2)
    for step, auc in [(1, 0.58), (2, 0.70), (3, 0.62), (4, 0.66)]:
        mngr.save(step, state.replace(step=step), {"auc": auc})
    assert mngr.best_step() == 2
    mngr.close()


def test_cli_train_eval_submit(tmp_path, monkeypatch):
    """Full CLI lifecycle on synthetic data: train -> eval -> submit."""
    from pytorch_news_recommender_tpu import cli

    monkeypatch.chdir(tmp_path)
    rc = cli.main([
        "train", "--data", "synthetic", "--model", "nrms",
        "--epochs", "1", "--batch-size", "32",
        "--save-dir", str(tmp_path / "save"), "--no-pallas",
        "--compute-dtype", "float32",
    ])
    assert rc == 0
    ckpt_dir = tmp_path / "save" / "nrms"
    assert (ckpt_dir / "config.json").exists()
    assert (ckpt_dir / "metrics.jsonl").exists()
    lines = [json.loads(l) for l in
             (ckpt_dir / "metrics.jsonl").read_text().splitlines()]
    assert any("auc" in l for l in lines)

    rc = cli.main(["eval", "--data", "synthetic", "--ckpt", str(ckpt_dir),
                   "--split", "dev"])
    assert rc == 0

    out = tmp_path / "submission.txt"
    rc = cli.main(["submit", "--data", "synthetic", "--ckpt", str(ckpt_dir),
                   "--out", str(out)])
    assert rc == 0
    text = out.read_text().splitlines()
    assert len(text) > 0
    # format: "<key> [r1,r2,...]"
    key, ranks = text[0].split(" ", 1)
    assert ranks.startswith("[") and ranks.endswith("]")
    parsed = [int(x) for x in ranks[1:-1].split(",")]
    assert sorted(parsed) == list(range(1, len(parsed) + 1))


def test_cli_stats(tmp_path, capsys):
    """`stats` replaces the reference's ad-hoc _count_news_ids prints
    (data_processor.py:417-449) with structured JSON over artifacts."""
    import json

    from pytorch_news_recommender_tpu import cli
    from pytorch_news_recommender_tpu.config import synthetic_config
    from pytorch_news_recommender_tpu.data import synthetic

    cfg = synthetic_config()
    ds = synthetic.generate(cfg.data, seed=0, n_train=128, n_dev=16)
    art = tmp_path / "artifacts"
    ds.save(art)

    rc = cli.main(["stats", "--artifacts", str(art)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["train"]["impressions"] == 128
    assert out["dev"]["impressions"] == 16
    assert out["dev"]["distinct_news"] <= out["n_news"]
    assert 0.0 < out["dev"]["ctr"] < 1.0


def test_cli_auto_resume(tmp_path, capsys):
    """--auto-resume restores the run's own latest checkpoint (full state,
    so optimization continues exactly — crash-restart recovery, unlike the
    reference's optimizer-resetting --load, SURVEY.md §5)."""
    from pytorch_news_recommender_tpu import cli

    save = tmp_path / "save"
    common = ["train", "--data", "synthetic", "--model", "nrms",
              "--epochs", "1", "--batch-size", "64",
              "--eval-step", "8",  # mid-epoch eval/checkpoint cadence
              "--save-dir", str(save), "--seed", "3"]
    assert cli.main(common) == 0
    capsys.readouterr()
    # --eval-step produced mid-epoch checkpoints (crash-restart points)
    steps = [int(p.name) for p in (save / "nrms").iterdir()
             if p.name.isdigit()]
    n_steps = 2048 // 64  # synthetic preset: n_train // batch
    assert steps and min(steps) < n_steps, steps
    assert cli.main(common + ["--auto-resume"]) == 0
    err = capsys.readouterr().err
    assert "auto-resumed" in err, err


def test_cli_log_attention(tmp_path):
    """--log-attention writes per-site attention summaries to metrics.jsonl."""
    import json

    from pytorch_news_recommender_tpu import cli

    save = tmp_path / "save"
    rc = cli.main(["train", "--data", "synthetic", "--model", "nrms",
                   "--epochs", "1", "--batch-size", "64",
                   "--save-dir", str(save), "--seed", "4",
                   "--log-attention"])
    assert rc == 0
    lines = [json.loads(l) for l in
             (save / "nrms" / "metrics.jsonl").read_text().splitlines()]
    att = [l for l in lines if l.get("tag") == "attention"]
    assert len(att) >= 2  # news-tower (title) + user-tower (history) sites
    for a in att:
        assert 0.0 <= a["entropy"] <= 1.0 + 1e-6


def test_cli_export_vectors(tmp_path, monkeypatch):
    """export-vectors writes the corpus table (f32 and int8 forms) and the
    int8 form dequantizes back to the float vectors."""
    from pytorch_news_recommender_tpu import cli

    monkeypatch.chdir(tmp_path)
    rc = cli.main([
        "train", "--data", "synthetic", "--model", "nrms",
        "--epochs", "1", "--batch-size", "32",
        "--save-dir", str(tmp_path / "save"), "--no-pallas",
        "--compute-dtype", "float32",
    ])
    assert rc == 0
    ckpt_dir = tmp_path / "save" / "nrms"

    out_f = tmp_path / "vecs.npz"
    rc = cli.main(["export-vectors", "--data", "synthetic",
                   "--ckpt", str(ckpt_dir), "--out", str(out_f)])
    assert rc == 0
    vecs = np.load(out_f)["news_vectors"]
    assert vecs.dtype == np.float32 and vecs.ndim == 2

    out_q = tmp_path / "vecs_q.npz"
    rc = cli.main(["export-vectors", "--data", "synthetic",
                   "--ckpt", str(ckpt_dir), "--out", str(out_q), "--int8"])
    assert rc == 0
    z = np.load(out_q)
    deq = z["news_q"].astype(np.float32) * z["news_scale"]
    scale = np.abs(vecs).max() + 1e-9
    np.testing.assert_allclose(deq / scale, vecs / scale, atol=0.01)

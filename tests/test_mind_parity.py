"""Smoke test for the one-command MIND parity harness
(benchmarks/mind_parity.py): raw TSVs -> preprocess -> CLI train ->
best-checkpoint eval -> JSON verdict, plus resumability (second invocation
skips preprocess and auto-resumes the checkpoint)."""

import importlib.util
import json
import pathlib

import numpy as np
import pytest

from test_mind import DEV_BEHAVIORS, DEV_NEWS_TSV, NEWS_TSV, TRAIN_BEHAVIORS


def _load_harness():
    path = (pathlib.Path(__file__).parent.parent / "benchmarks"
            / "mind_parity.py")
    spec = importlib.util.spec_from_file_location("mind_parity", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def mind_root(tmp_path):
    root = tmp_path / "mind"
    for split, news, beh in [("train", NEWS_TSV, TRAIN_BEHAVIORS),
                             ("dev", DEV_NEWS_TSV, DEV_BEHAVIORS)]:
        d = root / split
        d.mkdir(parents=True)
        (d / "news.tsv").write_text(news)
        (d / "behaviors.tsv").write_text(beh)
    # full-dim GloVe so the default model dims (300, 10 heads) apply
    rng = np.random.default_rng(0)
    glove = "\n".join(
        f"{w} " + " ".join(f"{v:.4f}" for v in rng.normal(size=300))
        for w in ("team", "game", "results", "election", "markets")) + "\n"
    (tmp_path / "glove.txt").write_text(glove)
    return root


def test_smoke_chain_and_resume(mind_root, tmp_path, capsys):
    harness = _load_harness()
    work = tmp_path / "run"
    argv = ["--mind-root", str(mind_root),
            "--glove", str(mind_root.parent / "glove.txt"),
            "--workdir", str(work), "--smoke", "--no-pallas",
            "--batch-size", "2", "--history-len", "6",
            "--min-history", "3", "--sample-size", "2",
            "--word-freq-threshold", "2"]
    assert harness.main(argv) == 0
    out = capsys.readouterr().out.strip().splitlines()
    verdict = json.loads(out[-1])
    assert verdict["metric"] == "dev_auc"
    assert 0.0 <= verdict["value"] <= 1.0
    assert verdict["target"] == harness.REFERENCE_DEV_AUC
    assert verdict["parity"] is None  # smoke runs don't claim parity
    assert (work / "artifacts" / "meta.json").exists()
    # machine-readable verdict persisted alongside the checkpoints
    assert json.loads((work / "verdict.json").read_text()) == verdict

    # second invocation: artifacts reused, checkpoint auto-resumed, same
    # verdict structure (the real-data path survives preemption this way)
    assert harness.main(argv) == 0
    out2 = capsys.readouterr().out.strip().splitlines()
    verdict2 = json.loads(out2[-1])
    assert verdict2["metric"] == "dev_auc"
    assert 0.0 <= verdict2["value"] <= 1.0


def test_missing_data_is_reported(tmp_path, capsys):
    harness = _load_harness()
    rc = harness.main(["--mind-root", str(tmp_path / "nope")])
    assert rc == 2


def test_zip_layout_and_env_autodetect(tmp_path, monkeypatch):
    """MINDsmall_train/-style zip-extraction dirs are recognized, both via
    --mind-root and via $MIND_ROOT auto-detection, and resolve to the
    MIND-small target (round-2 verdict item 5)."""
    harness = _load_harness()
    root = tmp_path / "downloads"
    for split, news, beh in [("MINDsmall_train", NEWS_TSV, TRAIN_BEHAVIORS),
                             ("MINDsmall_dev", DEV_NEWS_TSV, DEV_BEHAVIORS)]:
        d = root / split
        d.mkdir(parents=True)
        (d / "news.tsv").write_text(news)
        (d / "behaviors.tsv").write_text(beh)

    splits, variant = harness.find_splits(root)
    assert variant == "small"
    assert splits["train"].name == "MINDsmall_train"
    assert "test" not in splits
    assert harness.TARGETS["small"][0] == harness.SMALL_DEV_AUC

    monkeypatch.setenv("MIND_ROOT", str(root))
    found = harness.discover()
    assert found is not None and found[1] == "small"

    # a large-only request must not match the small layout
    assert harness.find_splits(root, "large") is None


@pytest.mark.parametrize("family", ["npa", "fastformer"])
def test_smoke_family_sweep(mind_root, tmp_path, capsys, family):
    """The standing parity order includes one-epoch runs of the
    battery-calibrated families (`--model npa|fastformer`, QUALITY.md
    scoping note); the harness chain must work for them end-to-end —
    family defaults (e.g. npa's lr) apply through the CLI."""
    harness = _load_harness()
    work = tmp_path / f"run_{family}"
    argv = ["--mind-root", str(mind_root),
            "--glove", str(mind_root.parent / "glove.txt"),
            "--workdir", str(work), "--smoke", "--no-pallas",
            "--model", family,
            "--batch-size", "2", "--history-len", "6",
            "--min-history", "3", "--sample-size", "2",
            "--word-freq-threshold", "2"]
    assert harness.main(argv) == 0
    out = capsys.readouterr().out.strip().splitlines()
    verdict = json.loads(out[-1])
    assert verdict["metric"] == "dev_auc"
    assert 0.0 <= verdict["value"] <= 1.0
    assert verdict["model"] == family

"""Multi-host feeding helpers (single-process semantics on the virtual
8-device mesh: this host owns the whole batch, so global assembly must be
equivalent to a sharded device_put)."""

import jax
import numpy as np
import pytest

from pytorch_news_recommender_tpu.config import MeshConfig
from pytorch_news_recommender_tpu.parallel.distributed import (
    global_batch,
    initialize,
    process_local_slice,
)
from pytorch_news_recommender_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
)


def test_initialize_single_process_noop():
    initialize()  # must not raise without a coordinator
    assert jax.process_count() == 1


def test_process_local_slice_covers_batch():
    s = process_local_slice(64)
    assert (s.start, s.stop) == (0, 64)


def _sliced_iters(data, bs, seed, process_count, dedup):
    from pytorch_news_recommender_tpu.data.loader import train_batches_sliced
    return [
        list(train_batches_sliced(
            data, bs, np.random.default_rng(seed), process_index=h,
            process_count=process_count, dedup=dedup))
        for h in range(process_count)
    ]


def _planted(n_train=96, n_dev=24):
    from pytorch_news_recommender_tpu.config import synthetic_config
    from pytorch_news_recommender_tpu.data import synthetic
    cfg = synthetic_config()
    ds = synthetic.generate(cfg.data, seed=3, n_train=n_train, n_dev=n_dev)
    return cfg, ds


def test_sliced_loader_reassembles_global_batches():
    """Concatenating every process's slice reproduces the global batch the
    single-process loader yields with the same seed."""
    from pytorch_news_recommender_tpu.data.loader import train_batches
    _, ds = _planted()
    bs = 16
    per_host = _sliced_iters(ds.train, bs, seed=7, process_count=2,
                             dedup=False)
    ref = list(train_batches(ds.train, bs, np.random.default_rng(7)))
    assert len(per_host[0]) == len(ref)
    for i, gb in enumerate(ref):
        for k in gb:
            got = np.concatenate([per_host[h][i][k] for h in range(2)], axis=0)
            np.testing.assert_array_equal(got, gb[k])


def test_sliced_loader_dedup_blocks_resolve_to_same_news():
    """Per-process dedup blocks with offset inverse indices must gather back
    the exact news ids of the raw global batch; all processes agree on the
    bucket width."""
    from pytorch_news_recommender_tpu.data.loader import train_batches
    _, ds = _planted(n_train=128)
    bs = 32
    per_host = _sliced_iters(ds.train, bs, seed=5, process_count=2,
                             dedup=True)
    raw = list(train_batches(ds.train, bs, np.random.default_rng(5)))
    for i, gb in enumerate(raw):
        b0, b1 = per_host[0][i], per_host[1][i]
        if "unique_ids" not in b0:
            assert "unique_ids" not in b1  # direct-form choice is global
            continue
        assert b0["unique_ids"].shape == b1["unique_ids"].shape
        uniq = np.concatenate([b0["unique_ids"], b1["unique_ids"]])
        browsed_idx = np.concatenate(
            [b0["browsed_idx"], b1["browsed_idx"]], axis=0)
        cand_idx = np.concatenate(
            [b0["candidate_idx"], b1["candidate_idx"]], axis=0)
        np.testing.assert_array_equal(uniq[browsed_idx], gb["browsed_ids"])
        np.testing.assert_array_equal(uniq[cand_idx], gb["candidate_ids"])


def test_sliced_length_split_blocks_exact():
    """Multi-process length split: per-process blocks partitioned at one
    agreed short width still gather back the exact raw ids, and a mesh
    train step through the block-structured encode matches the no-split
    sliced batch's loss (truncation is exact under the mask semantics)."""
    import dataclasses

    from pytorch_news_recommender_tpu.config import MeshConfig, synthetic_config
    from pytorch_news_recommender_tpu.data import synthetic
    from pytorch_news_recommender_tpu.data.loader import train_batches_sliced
    from pytorch_news_recommender_tpu.parallel.mesh import make_mesh
    from pytorch_news_recommender_tpu.train.loop import Trainer

    cfg = synthetic_config()
    # dropout off: the two batch forms draw different dropout streams over
    # differently-shaped intermediates; exactness is only comparable with a
    # deterministic apply
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, dropout=0.0))
    ds = synthetic.generate(cfg.data, seed=11, n_train=128, n_dev=8,
                            title_len=(11.5, 3.5))
    mesh = make_mesh(MeshConfig())
    trainer = Trainer(cfg, ds, mesh=mesh)
    assert trainer._length_split is not None
    split = dataclasses.replace(trainer._length_split, grid=64)

    buckets = (256, 512, 1024)  # small enough that dedup beats direct form
    def iters(length_split):
        return [
            list(train_batches_sliced(
                ds.train, 32, np.random.default_rng(5), process_index=h,
                process_count=2, dedup=True, unique_buckets=buckets,
                length_split=length_split))
            for h in range(2)
        ]

    per_host = iters(split)
    plain = iters(None)
    raw = __import__(
        "pytorch_news_recommender_tpu.data.loader", fromlist=["train_batches"]
    ).train_batches(ds.train, 32, np.random.default_rng(5))

    state = trainer.init_state(seed=0)
    saw_split = False
    for i, gb in enumerate(raw):
        b0, b1 = per_host[0][i], per_host[1][i]
        if "short_mark" not in b0:
            continue
        saw_split = True
        assert b0["block_mark"].shape == (2,)
        assert b0["short_mark"].shape == b1["short_mark"].shape
        # gather parity against the raw global batch
        uniq = np.concatenate([b0["unique_ids"], b1["unique_ids"]])
        bidx = np.concatenate([b0["browsed_idx"], b1["browsed_idx"]])
        cidx = np.concatenate([b0["candidate_idx"], b1["candidate_idx"]])
        np.testing.assert_array_equal(uniq[bidx], gb["browsed_ids"])
        np.testing.assert_array_equal(uniq[cidx], gb["candidate_ids"])
        # model equivalence on the mesh: block-structured split vs no split
        def assemble(parts):
            out = {}
            for k in parts[0]:
                if k.endswith("_mark"):
                    out[k] = parts[0][k]
                else:
                    out[k] = np.concatenate([p[k] for p in parts], axis=0)
            return out
        g_split = assemble([b0, b1])
        g_plain = assemble([plain[0][i], plain[1][i]])
        import jax
        # run_step donates the state: use a fresh identical state per call
        _, m_a = trainer.run_step(trainer.init_state(seed=0), g_split,
                                  jax.random.PRNGKey(1))
        _, m_b = trainer.run_step(trainer.init_state(seed=0), g_plain,
                                  jax.random.PRNGKey(1))
        np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                                   rtol=1e-5, atol=1e-6)
        break
    assert saw_split, "fixture never produced a split batch — tune grid"


def test_fit_through_sliced_feed_matches_plain():
    """Trainer.fit with the multi-process feed path forced
    (sliced_feed=True, process_count=1) must produce the same per-step
    losses and eval metrics as the plain path — it is the same global batch
    assembled via make_array_from_process_local_data instead of device_put."""
    import dataclasses

    from pytorch_news_recommender_tpu.train.loop import Trainer

    cfg, ds = _planted()
    # dedup off: the sliced path skips length-split partitioning, so only
    # the non-dedup layout is bit-comparable against the plain path
    base = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, batch_size=16, eval_batch_size=8, num_epochs=1,
            dedup_batches=False, log_every=1, eval_step=0))

    losses = {}
    metrics = {}
    for mode in ("plain", "sliced"):
        c = dataclasses.replace(
            base, train=dataclasses.replace(base.train,
                                            sliced_feed=(mode == "sliced")))
        tr = Trainer(c, ds)
        state = tr.init_state(seed=0)
        log = []
        state, _ = tr.fit(state, log_fn=lambda d: log.append(d),
                          eval_each_epoch=False)
        losses[mode] = [d["loss"] for d in log if "loss" in d]
        metrics[mode] = tr.evaluate(state)
    assert len(losses["plain"]) == len(losses["sliced"]) > 0
    np.testing.assert_allclose(losses["plain"], losses["sliced"],
                               rtol=1e-5, atol=1e-6)
    assert metrics["plain"]["auc"] == pytest.approx(
        metrics["sliced"]["auc"], abs=1e-6)
    assert metrics["plain"]["n_impressions"] == metrics["sliced"]["n_impressions"]


def test_fit_sliced_with_dedup_learns():
    """Sliced feed + per-process dedup: losses stay finite and planted
    structure is learned (values differ from the plain path only in the
    unique-buffer layout)."""
    import dataclasses

    from pytorch_news_recommender_tpu.train.loop import Trainer

    cfg, ds = _planted(n_train=192)
    c = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, batch_size=16, eval_batch_size=8, num_epochs=2,
            dedup_batches=True, sliced_feed=True, eval_step=0))
    tr = Trainer(c, ds)
    state = tr.init_state(seed=0)
    state, _ = tr.fit(state, eval_each_epoch=False)
    m = tr.evaluate(state)
    assert np.isfinite(m["auc"]) and 0.0 <= m["auc"] <= 1.0


def test_global_batch_matches_device_put():
    mesh_cfg = MeshConfig()
    mesh = make_mesh(mesh_cfg)
    shard = batch_sharding(mesh, mesh_cfg)
    local = {
        "browsed_ids": np.arange(64 * 5, dtype=np.int32).reshape(64, 5),
        "candidate_ids": np.arange(64 * 3, dtype=np.int32).reshape(64, 3),
    }
    out = global_batch(local, {k: shard for k in local},
                       {k: 64 for k in local})
    for k, v in local.items():
        assert out[k].shape == v.shape
        assert out[k].sharding == shard
        np.testing.assert_array_equal(np.asarray(out[k]), v)

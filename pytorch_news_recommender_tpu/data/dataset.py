"""Columnar in-memory dataset containers.

The reference materializes per-sample Python lists in pickles and rebuilds
``[50, 20]`` word tensors per sample inside ``Dataset.__getitem__``
(``MIND_2020/data_handler.py:185-250``). Here everything is a contiguous
numpy array built once:

* ``NewsFeatures`` — one row per news (row 0 = pad), uploaded to device once;
* ``TrainData``    — ``[n, H]`` histories + ``[n, 1+K]`` candidate groups
  (positive at slot 0, reference ``data_processor.py:519-528``);
* ``DevData``      — ragged candidate lists stored flat + offsets, with 0/1
  labels (reference dev keeps full impression lists,
  ``data_processor.py:530-532``).

Batch assembly is then pure array slicing — no per-sample Python.
"""

from __future__ import annotations

import dataclasses
import pathlib
from typing import Dict, Optional

import numpy as np

from pytorch_news_recommender_tpu.config import ArtifactMeta


@dataclasses.dataclass
class NewsFeatures:
    """Device-residable per-news feature tables. Row 0 is the pad news
    (all zeros). Word ids use 0 = pad."""

    title: np.ndarray                   # [N, L_title] int32
    abst: Optional[np.ndarray] = None   # [N, L_abst] int32
    categ: Optional[np.ndarray] = None  # [N] int32
    subcateg: Optional[np.ndarray] = None  # [N] int32
    bert: Optional[np.ndarray] = None   # [N, bert_dim] float32
    entity: Optional[np.ndarray] = None  # [N, E] int32 entity ids per news

    @property
    def n_news(self) -> int:
        return self.title.shape[0]

    def as_dict(self) -> Dict[str, np.ndarray]:
        return {k: v for k, v in dataclasses.asdict(self).items() if v is not None}


@dataclasses.dataclass
class TrainData:
    """Fixed-shape negative-sampled training impressions."""

    browsed_ids: np.ndarray     # [n, H] int32, 0-padded (most-recent last)
    candidate_ids: np.ndarray   # [n, 1+K] int32, positive at slot 0

    def __len__(self) -> int:
        return self.browsed_ids.shape[0]


@dataclasses.dataclass
class DevData:
    """Ragged eval impressions stored flat (CSR-style)."""

    browsed_ids: np.ndarray     # [m, H] int32
    cand_flat: np.ndarray       # [sum_i c_i] int32 news ids
    label_flat: np.ndarray      # [sum_i c_i] int8 click labels
    offsets: np.ndarray         # [m+1] int64 into cand_flat/label_flat

    def __len__(self) -> int:
        return self.browsed_ids.shape[0]

    def n_candidates(self, i: int) -> int:
        return int(self.offsets[i + 1] - self.offsets[i])

    @property
    def candidate_counts(self) -> np.ndarray:
        return np.diff(self.offsets).astype(np.int32)

    def impression(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        s, e = self.offsets[i], self.offsets[i + 1]
        return self.cand_flat[s:e], self.label_flat[s:e]


@dataclasses.dataclass
class RecDataset:
    """A fully prepared dataset split bundle."""

    news: NewsFeatures
    train: Optional[TrainData]
    dev: Optional[DevData]
    test: Optional[DevData]  # labels all-zero for test (unknown)
    meta: ArtifactMeta

    # ---- persistence (npz + json metadata; replaces the reference's
    # convention-keyed pickles, ``data_processor.py:498-503``) ----
    def save(self, path: str | pathlib.Path) -> None:
        path = pathlib.Path(path)
        path.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(path / "news.npz", **self.news.as_dict())
        if self.train is not None:
            np.savez_compressed(path / "train.npz",
                                **dataclasses.asdict(self.train))
        for split_name in ("dev", "test"):
            split = getattr(self, split_name)
            if split is not None:
                np.savez_compressed(path / f"{split_name}.npz",
                                    **dataclasses.asdict(split))
        self.meta.save(path / "meta.json")

    @classmethod
    def load(cls, path: str | pathlib.Path) -> "RecDataset":
        path = pathlib.Path(path)
        news_npz = dict(np.load(path / "news.npz"))
        news = NewsFeatures(**news_npz)
        meta = ArtifactMeta.load(path / "meta.json")

        def load_split(name, tp):
            p = path / f"{name}.npz"
            if not p.exists():
                return None
            return tp(**dict(np.load(p)))

        return cls(
            news=news,
            train=load_split("train", TrainData),
            dev=load_split("dev", DevData),
            test=load_split("test", DevData),
            meta=meta,
        )

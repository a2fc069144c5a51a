"""Data layer: offline MIND preprocessing into columnar numpy artifacts,
a synthetic MIND-like generator for tests/benchmarks, and the runtime
batcher that feeds the device with id-only batches."""

from pytorch_news_recommender_tpu.data.dataset import (
    DevData,
    NewsFeatures,
    RecDataset,
    TrainData,
)

__all__ = ["RecDataset", "NewsFeatures", "TrainData", "DevData"]

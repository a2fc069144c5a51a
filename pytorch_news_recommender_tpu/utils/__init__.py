from pytorch_news_recommender_tpu.utils.logging import JsonlLogger, Timer

__all__ = ["JsonlLogger", "Timer"]

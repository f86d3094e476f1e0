"""Encoder fine-tuning: contrastive training on TPU meshes."""

from .contrastive import TrainState, contrastive_loss, make_train_step

__all__ = ["TrainState", "contrastive_loss", "make_train_step"]

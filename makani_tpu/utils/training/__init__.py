from .deterministic_trainer import Trainer

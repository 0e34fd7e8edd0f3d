"""Train entry point — `python -m eyoc_tpu.cli.train --flags`
(reference train.py:54-98 with the same flag surface)."""

from __future__ import annotations

import logging
import sys

import numpy as np

from eyoc_tpu.config import get_config
from eyoc_tpu.data.loader import make_data_loader
from eyoc_tpu.parallel.mesh import maybe_distributed_init
from eyoc_tpu.training.trainer import get_trainer

ch = logging.StreamHandler(sys.stdout)
logging.getLogger().setLevel(logging.INFO)
logging.basicConfig(
    format="%(asctime)s %(message)s",
    datefmt="%m/%d %H:%M:%S",
    handlers=[ch],
)


def main(config):
    from eyoc_tpu.utils.platform import apply_platform_env
    apply_platform_env(config)
    maybe_distributed_init(config)
    np.random.seed(config.get("seed", 0))
    train_loader = make_data_loader(config, config.train_phase, config.batch_size)
    val_loader = None
    if config.test_valid:
        val_loader = make_data_loader(config, config.val_phase, config.val_batch_size)

    Trainer = get_trainer(config.trainer)
    trainer = Trainer(config, train_loader, val_loader)
    trainer.train()


if __name__ == "__main__":
    config = get_config()
    main(config)

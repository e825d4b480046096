from diffsinger_tpu.config.hparams import HParams, load_config, set_hparams, hparams

__all__ = ["HParams", "load_config", "set_hparams", "hparams"]

from promptttspp_tpu.config.compose import (
    Config, apply_hydra_runtime, compose, load_yaml, main)
from promptttspp_tpu.config.instantiate import instantiate, register_target

__all__ = ["Config", "apply_hydra_runtime", "compose", "load_yaml", "main", "instantiate", "register_target"]

from promptttspp_tpu.vocoders.bigvgan import BigVGAN
from promptttspp_tpu.vocoders.bigvgan_f0 import F0AwareBigVGAN

__all__ = ["BigVGAN", "F0AwareBigVGAN"]

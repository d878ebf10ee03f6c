from lcgan_tpu.models.discriminator import Discriminator
from lcgan_tpu.models.generator import Generator, SynthesisBlock, ToRGBBlock

__all__ = ["Discriminator", "Generator", "SynthesisBlock", "ToRGBBlock"]
